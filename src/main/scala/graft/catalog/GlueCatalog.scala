package graft.catalog

import scala.collection.concurrent.TrieMap

/** The AWS Glue Data Catalog surface this engine consumes — the 9th and
  * last of the reference's catalog kinds (`CatalogMigrationUtil
  * .java:36-46` dispatches GLUE through Iceberg's GlueCatalog). The
  * trait mirrors the public Glue API item shapes (Database / Table with
  * a parameters map and a version id for optimistic locking), so a
  * production adapter is a thin AWS-SDK wrapper loaded reflectively
  * (`glue-impl`), while [[MemoryGlueApi]] makes the model fully
  * testable in this offline environment — the same seam discipline as
  * [[KvStore]].
  */
trait GlueApi extends AutoCloseable {
  def getDatabase(name: String): Option[GlueDatabase]
  def getDatabases(): Seq[GlueDatabase]
  /** True iff the database was absent and is now created (AWS throws
    * AlreadyExistsException — adapters translate to false). */
  def createDatabase(db: GlueDatabase): Boolean
  def getTable(database: String, name: String): Option[GlueTable]
  def getTables(database: String): Seq[GlueTable]
  /** True iff the table was absent and is now created. */
  def createTable(database: String, table: GlueTable): Boolean
  /** Update iff the stored version id equals `table.versionId` (Glue's
    * optimistic locking: UpdateTable with the read VersionId); the
    * stored entry gets a NEW version id. False = a rival updated first. */
  def updateTable(database: String, table: GlueTable): Boolean
  /** True iff an entry was removed. */
  def deleteTable(database: String, name: String): Boolean
  override def close(): Unit = ()
}

/** Glue Database item (the namespace): single-level by construction —
  * Glue has no nested databases, exactly the Hive limitation. */
final case class GlueDatabase(name: String,
    parameters: Map[String, String] = Map.empty)

/** Glue Table item, Iceberg-convention fields: `tableType`
  * EXTERNAL_TABLE, `parameters` carrying `table_type=ICEBERG` and
  * `metadata_location` (the pointer — the whole migration payload),
  * `versionId` for optimistic concurrency. */
final case class GlueTable(name: String,
    tableType: String = "EXTERNAL_TABLE",
    parameters: Map[String, String] = Map.empty,
    versionId: String = "1")

/** JVM-global in-memory [[GlueApi]], looked up by id (the registry
  * pattern of [[MemoryKvStore]]): all mutations are atomic on the
  * underlying concurrent maps, so register races and update races
  * resolve IN THE FAKE exactly as they would in the service. */
final class MemoryGlueApi private (val id: String) extends GlueApi {
  private val databases = TrieMap.empty[String, GlueDatabase]
  private val tables = TrieMap.empty[(String, String), GlueTable]

  override def getDatabase(name: String): Option[GlueDatabase] =
    databases.get(name)
  override def getDatabases(): Seq[GlueDatabase] =
    databases.values.toVector.sortBy(_.name)
  override def createDatabase(db: GlueDatabase): Boolean =
    databases.putIfAbsent(db.name, db).isEmpty
  override def getTable(database: String, name: String): Option[GlueTable] =
    tables.get((database, name))
  override def getTables(database: String): Seq[GlueTable] =
    tables.snapshot().iterator
      .collect { case ((db, _), t) if db == database => t }
      .toVector.sortBy(_.name)
  override def createTable(database: String, table: GlueTable): Boolean =
    tables.putIfAbsent((database, table.name), table).isEmpty
  override def updateTable(database: String, table: GlueTable): Boolean = {
    val k = (database, table.name)
    tables.get(k) match {
      case Some(cur) if cur.versionId == table.versionId =>
        tables.replace(k, cur,
          table.copy(versionId = (cur.versionId.toLong + 1).toString))
      case _ => false
    }
  }
  override def deleteTable(database: String, name: String): Boolean =
    tables.remove((database, name)).isDefined
}

object MemoryGlueApi {
  private val registry = TrieMap.empty[String, MemoryGlueApi]
  def forId(id: String): MemoryGlueApi =
    registry.getOrElseUpdate(id, new MemoryGlueApi(id))
}

/** [[Catalog]] over the Glue model (the reference's GLUE kind,
  * re-expressed): namespaces are Glue DATABASES — single-level only,
  * like Hive — and a table is a Glue Table item whose
  * `metadata_location` parameter IS the pointer (the public Iceberg
  * GlueCatalog layout). Register races resolve in the store (one
  * conditional create wins); pointer commits are version-id-checked
  * updates ([[replaceTablePointer]]), Glue's own optimistic locking. */
final class GlueCatalog(val name: String, api: GlueApi,
    ownsApi: Boolean = false) extends Catalog {

  import GlueCatalog._

  private def oneLevel(ns: Namespace): String = {
    if (ns.levels.size != 1)
      throw new IllegalArgumentException(
        s"Catalog $name supports only single-level namespaces, got: $ns")
    ns.levels.head
  }

  override def listNamespaces(parent: Namespace): Seq[Namespace] =
    if (parent.isEmpty) api.getDatabases().map(d => Namespace.of(d.name))
    else if (parent.levels.size == 1) {
      if (!namespaceExists(parent))
        throw new NoSuchNamespaceException(s"Namespace does not exist: $parent")
      Nil // Glue databases have no children
    } else
      throw new IllegalArgumentException(
        s"Catalog $name supports only single-level namespaces, got: $parent")

  override def namespaceExists(ns: Namespace): Boolean =
    ns.levels.size == 1 && api.getDatabase(ns.levels.head).isDefined

  override def createNamespace(ns: Namespace): Unit = {
    if (ns.isEmpty)
      throw new IllegalArgumentException(
        s"Cannot create empty namespace in catalog $name")
    if (!api.createDatabase(GlueDatabase(oneLevel(ns))))
      throw new AlreadyExistsException(s"Namespace already exists: $ns")
  }

  override def listTables(ns: Namespace): Seq[TableRef] = {
    if (!namespaceExists(ns))
      throw new NoSuchNamespaceException(s"Namespace does not exist: $ns")
    api.getTables(ns.levels.head).map(t => TableRef(ns, t.name))
  }

  override def tableExists(ref: TableRef): Boolean =
    ref.namespace.levels.size == 1 &&
      api.getTable(ref.namespace.levels.head, ref.name).isDefined

  override def loadTableMetadataLocation(ref: TableRef): String =
    api.getTable(oneLevel(ref.namespace), ref.name)
      .flatMap(_.parameters.get(MetadataLocation))
      .getOrElse(throw new NoSuchTableException(s"Table does not exist: $ref"))

  override def registerTable(ref: TableRef, metadataLocation: String): Unit = {
    if (!namespaceExists(ref.namespace))
      throw new NoSuchNamespaceException(
        s"Namespace does not exist: ${ref.namespace}")
    val item = GlueTable(ref.name, parameters = Map(
      TableType -> "ICEBERG", MetadataLocation -> metadataLocation))
    if (!api.createTable(ref.namespace.levels.head, item))
      throw new AlreadyExistsException(s"Table already exists: $ref")
  }

  /** Pointer commit as Glue optimistic locking: re-read the item, check
    * the location the committer derived from, UpdateTable against the
    * read version id. False = a rival landed first (re-read and retry). */
  def replaceTablePointer(ref: TableRef, expectedLocation: String,
      newLocation: String): Boolean = {
    val db = oneLevel(ref.namespace)
    api.getTable(db, ref.name) match {
      case Some(cur) if cur.parameters.get(MetadataLocation).contains(expectedLocation) =>
        api.updateTable(db, cur.copy(parameters =
          cur.parameters + (MetadataLocation -> newLocation)))
      case _ => false
    }
  }

  override def dropTable(ref: TableRef): Boolean =
    ref.namespace.levels.size == 1 &&
      api.deleteTable(ref.namespace.levels.head, ref.name)

  override def close(): Unit = if (ownsApi) api.close()
}

object GlueCatalog {
  /** Iceberg's Glue table-parameter keys (public convention). */
  val MetadataLocation = "metadata_location"
  val TableType = "table_type"
}
