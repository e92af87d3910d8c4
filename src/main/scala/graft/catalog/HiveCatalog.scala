package graft.catalog

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.conf.HiveConf
import org.apache.hadoop.hive.metastore.HiveMetaStoreClient
import org.apache.hadoop.hive.metastore.api.{AlreadyExistsException => HmsAlreadyExists, Database, NoSuchObjectException, SerDeInfo, StorageDescriptor, Table => HmsTable}

/** A REAL Hive-metastore catalog: table pointers live as the
  * `metadata_location` table parameter of an EXTERNAL_TABLE entry in a
  * Hive metastore — the public layout Iceberg's HiveCatalog uses and the
  * reference dispatches for its HIVE kind
  * (`CatalogMigrationUtil.java:36-46`).
  *
  * Embedded mode (`metastore-dir` property) runs the metastore
  * in-process over Derby — both ship with Spark, so the reference's Hive
  * quirk matrix (`ITHadoopToHiveCatalogMigrator.java:49-66`,
  * `ITNessieToHiveCatalogMigrator.java:48-66`) is exercised against an
  * ACTUAL metastore rather than the MemoryCatalog emulation:
  *
  *  - namespaces are Hive DATABASES — single-level only: nested
  *    namespaces are refused at create AND register, so migrating a
  *    nested-namespace source fail-softs exactly like the reference ITs;
  *  - the empty namespace is refused (no database to hold the table);
  *  - the built-in `default` database exists from the start and lists
  *    like any other namespace.
  *
  * Production points `uri` (thrift://host:port) at a shared metastore
  * instead; embedded Derby is single-process by nature, so instances are
  * JVM-registry-shared per metastore-dir (the MemoryCatalog pattern:
  * executor threads in local mode reach the same client; a cluster
  * deployment uses the thrift uri). The HMS client is not thread-safe —
  * methods synchronize on the instance. */
final class HiveCatalog private (val name: String, client: HiveMetaStoreClient,
    warehouseDir: String) extends Catalog {

  private def requireSingleLevel(ns: Namespace): Unit = {
    if (ns.isEmpty)
      throw new NoSuchNamespaceException(s"Invalid namespace: empty (catalog $name)")
    if (ns.levels.size > 1)
      throw new IllegalArgumentException(
        s"Catalog $name supports only single-level namespaces, got: $ns")
  }

  override def listNamespaces(parent: Namespace): Seq[Namespace] = synchronized {
    if (parent.isEmpty)
      client.getAllDatabases.asScala.toSeq.map(Namespace.of(_))
    else {
      // databases have no children; a missing parent is an error, an
      // existing one has an empty child list
      if (!namespaceExists(parent))
        throw new NoSuchNamespaceException(s"Namespace does not exist: $parent")
      Seq.empty
    }
  }

  override def namespaceExists(ns: Namespace): Boolean = synchronized {
    ns.levels.size == 1 &&
      (try { client.getDatabase(ns.levels.head); true }
       catch { case _: NoSuchObjectException => false })
  }

  override def createNamespace(ns: Namespace): Unit = synchronized {
    if (ns.isEmpty)
      throw new IllegalArgumentException(s"Cannot create empty namespace in catalog $name")
    if (ns.levels.size > 1)
      throw new IllegalArgumentException(
        s"Catalog $name supports only single-level namespaces, got: $ns")
    val db = new Database(ns.levels.head, null,
      s"file:$warehouseDir/${ns.levels.head}.db", new java.util.HashMap())
    try client.createDatabase(db)
    catch {
      case _: HmsAlreadyExists =>
        throw new AlreadyExistsException(s"Namespace already exists: $ns")
    }
  }

  override def listTables(ns: Namespace): Seq[TableRef] = synchronized {
    requireSingleLevel(ns)
    if (!namespaceExists(ns))
      throw new NoSuchNamespaceException(s"Namespace does not exist: $ns")
    client.getAllTables(ns.levels.head).asScala.toSeq
      .map(t => TableRef(ns, t))
  }

  override def tableExists(ref: TableRef): Boolean = synchronized {
    ref.namespace.levels.size == 1 &&
      client.tableExists(ref.namespace.levels.head, ref.name)
  }

  override def loadTableMetadataLocation(ref: TableRef): String = synchronized {
    requireSingleLevel(ref.namespace)
    val t =
      try client.getTable(ref.namespace.levels.head, ref.name)
      catch {
        case _: NoSuchObjectException =>
          throw new NoSuchTableException(s"Table does not exist: $ref")
      }
    Option(t.getParameters.get(HiveCatalog.PointerParam)).getOrElse(
      throw new NoSuchTableException(
        s"Table $ref carries no ${HiveCatalog.PointerParam} parameter " +
          "(not a pointer-registered table)"))
  }

  override def registerTable(ref: TableRef, metadataLocation: String): Unit = synchronized {
    requireSingleLevel(ref.namespace)
    if (!namespaceExists(ref.namespace))
      throw new NoSuchNamespaceException(s"Namespace does not exist: ${ref.namespace}")
    val sd = new StorageDescriptor()
    sd.setCols(new java.util.ArrayList())
    sd.setLocation(s"file:$warehouseDir/${ref.namespace.levels.head}.db/${ref.name}")
    sd.setInputFormat("org.apache.hadoop.mapred.FileInputFormat")
    sd.setOutputFormat("org.apache.hadoop.mapred.FileOutputFormat")
    val serde = new SerDeInfo()
    serde.setSerializationLib("org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe")
    serde.setParameters(new java.util.HashMap())
    sd.setSerdeInfo(serde)
    val t = new HmsTable()
    t.setDbName(ref.namespace.levels.head)
    t.setTableName(ref.name)
    t.setTableType("EXTERNAL_TABLE")
    t.setSd(sd)
    val params = new java.util.HashMap[String, String]()
    params.put(HiveCatalog.PointerParam, metadataLocation)
    params.put("EXTERNAL", "TRUE") // drop must never delete the pointed-at files
    t.setParameters(params)
    try client.createTable(t)
    catch {
      case _: HmsAlreadyExists =>
        throw new AlreadyExistsException(s"Table already exists: $ref")
    }
  }

  override def dropTable(ref: TableRef): Boolean = synchronized {
    if (!tableExists(ref)) false
    else {
      client.dropTable(ref.namespace.levels.head, ref.name,
        /* deleteData = */ false, /* ignoreUnknownTab = */ true)
      true
    }
  }

  // registry-shared instances stay open for the JVM (embedded metastore);
  // per-use close would tear the client out from under other holders
  override def close(): Unit = ()
}

object HiveCatalog {
  /** The table parameter holding the current metadata location — the
    * Iceberg HiveCatalog convention. */
  val PointerParam = "metadata_location"

  private val registry = TrieMap.empty[String, HiveCatalog]

  /** Embedded metastore over Derby at `metastoreDir` (created on first
    * use), JVM-shared per dir — Derby embedded is single-process. */
  def embedded(name: String, metastoreDir: String, warehouseDir: String): HiveCatalog =
    registry.getOrElseUpdate(metastoreDir, {
      val conf = new HiveConf()
      conf.set("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastoreDir/metastore_db;create=true")
      conf.set("javax.jdo.option.ConnectionDriverName",
        "org.apache.derby.jdbc.EmbeddedDriver")
      conf.set("hive.metastore.warehouse.dir", s"file:$warehouseDir")
      conf.set("hive.metastore.schema.verification", "false")
      conf.set("datanucleus.schema.autoCreateAll", "true")
      new HiveCatalog(name, new HiveMetaStoreClient(conf), warehouseDir)
    })

  /** Remote metastore (production): thrift uri, shared service. */
  def remote(name: String, uri: String, warehouseDir: String): HiveCatalog = {
    val conf = new HiveConf()
    conf.set("hive.metastore.uris", uri)
    conf.set("hive.metastore.warehouse.dir", s"file:$warehouseDir")
    new HiveCatalog(name, new HiveMetaStoreClient(conf), warehouseDir)
  }
}
