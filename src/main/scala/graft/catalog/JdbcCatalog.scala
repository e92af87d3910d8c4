package graft.catalog

import java.sql.{Connection, DriverManager, SQLException}

/** JDBC-backed catalog: namespaces and table→metadata-location pointers
  * live in two relational tables, so any JDBC database becomes a shared
  * catalog. This is the Scala re-expression of the reference's JDBC
  * catalog kind (`CatalogMigrationUtil.java:36-46` dispatches JDBC via
  * Iceberg's JdbcCatalog, whose public layout — a catalog-scoped pointer
  * table plus a namespace table — this mirrors):
  *
  *  - `graft_tables(catalog_name, table_namespace, table_name,
  *    metadata_location, previous_metadata_location)`, PK on the first
  *    three: a pointer write is one INSERT, and a register race resolves
  *    IN THE DATABASE — the loser's duplicate-key violation surfaces as
  *    the same [[AlreadyExistsException]] every other backend throws.
  *  - `graft_namespaces(catalog_name, namespace)`: explicit namespaces
  *    (Nessie/Hive-like shape), multi-level stored dot-joined.
  *
  * Tested against Derby embedded (ships with Spark, so this works
  * offline); the SQL is deliberately ANSI-minimal (no upserts, no
  * vendor pagination) so a production deployment can point `uri` at any
  * shared JDBC database. Concurrency: one connection per instance,
  * method-synchronized — catalog traffic is metadata-sized (3 RPCs per
  * migrated table, reference `CatalogMigrator.java:212-213`); executors
  * each build their own instance from the serializable
  * [[CatalogConfig]], exactly like the REST client face.
  */
final class JdbcCatalog(val name: String, uri: String,
    user: Option[String] = None, password: Option[String] = None)
  extends Catalog {

  private val conn: Connection = (user, password) match {
    case (Some(u), p) => DriverManager.getConnection(uri, u, p.getOrElse(""))
    case _ => DriverManager.getConnection(uri)
  }
  conn.setAutoCommit(true)
  initSchema()

  // SQLState prefix 23 = integrity-constraint violation (duplicate key)
  private def isDuplicateKey(e: SQLException): Boolean =
    Option(e.getSQLState).exists(_.startsWith("23"))
  // Derby: X0Y32 = schema object already exists (no CREATE TABLE IF NOT
  // EXISTS); 42Y55/42X05 variants cover DROP of missing objects elsewhere
  private def initSchema(): Unit = synchronized {
    val ddl = Seq(
      """CREATE TABLE graft_tables (
        | catalog_name VARCHAR(255) NOT NULL,
        | table_namespace VARCHAR(255) NOT NULL,
        | table_name VARCHAR(255) NOT NULL,
        | metadata_location VARCHAR(4000),
        | previous_metadata_location VARCHAR(4000),
        | PRIMARY KEY (catalog_name, table_namespace, table_name))""".stripMargin,
      """CREATE TABLE graft_namespaces (
        | catalog_name VARCHAR(255) NOT NULL,
        | namespace VARCHAR(255) NOT NULL,
        | PRIMARY KEY (catalog_name, namespace))""".stripMargin)
    ddl.foreach { sql =>
      val st = conn.createStatement()
      try st.execute(sql)
      catch {
        case e: SQLException if Option(e.getSQLState).contains("X0Y32") => ()
      } finally st.close()
    }
  }

  private def nsKey(ns: Namespace): String = ns.levels.mkString(".")

  override def listNamespaces(parent: Namespace): Seq[Namespace] = synchronized {
    val all = {
      val ps = conn.prepareStatement(
        "SELECT namespace FROM graft_namespaces WHERE catalog_name = ? ORDER BY namespace")
      ps.setString(1, name)
      val rs = ps.executeQuery()
      try Iterator.continually(rs).takeWhile(_.next()).map(_.getString(1)).toVector
      finally { rs.close(); ps.close() }
    }.map(Namespace.parse)
    NamespaceListing.childrenOf(all, parent)
  }

  override def namespaceExists(ns: Namespace): Boolean = synchronized {
    val ps = conn.prepareStatement(
      "SELECT 1 FROM graft_namespaces WHERE catalog_name = ? AND namespace = ?")
    ps.setString(1, name); ps.setString(2, nsKey(ns))
    val rs = ps.executeQuery()
    try rs.next() finally { rs.close(); ps.close() }
  }

  override def createNamespace(ns: Namespace): Unit = synchronized {
    if (ns.isEmpty)
      throw new IllegalArgumentException(s"Cannot create empty namespace in catalog $name")
    val ps = conn.prepareStatement(
      "INSERT INTO graft_namespaces (catalog_name, namespace) VALUES (?, ?)")
    ps.setString(1, name); ps.setString(2, nsKey(ns))
    try ps.executeUpdate()
    catch {
      case e: SQLException if isDuplicateKey(e) =>
        throw new AlreadyExistsException(s"Namespace already exists: $ns")
    } finally ps.close()
  }

  override def listTables(ns: Namespace): Seq[TableRef] = synchronized {
    if (!ns.isEmpty && !namespaceExists(ns))
      throw new NoSuchNamespaceException(s"Namespace does not exist: $ns")
    val ps = conn.prepareStatement(
      "SELECT table_name FROM graft_tables WHERE catalog_name = ? AND table_namespace = ? ORDER BY table_name")
    ps.setString(1, name); ps.setString(2, nsKey(ns))
    val rs = ps.executeQuery()
    try Iterator.continually(rs).takeWhile(_.next())
      .map(r => TableRef(ns, r.getString(1))).toVector
    finally { rs.close(); ps.close() }
  }

  override def tableExists(ref: TableRef): Boolean = synchronized {
    val ps = conn.prepareStatement(
      "SELECT 1 FROM graft_tables WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?")
    ps.setString(1, name); ps.setString(2, nsKey(ref.namespace)); ps.setString(3, ref.name)
    val rs = ps.executeQuery()
    try rs.next() finally { rs.close(); ps.close() }
  }

  override def loadTableMetadataLocation(ref: TableRef): String = synchronized {
    val ps = conn.prepareStatement(
      "SELECT metadata_location FROM graft_tables WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?")
    ps.setString(1, name); ps.setString(2, nsKey(ref.namespace)); ps.setString(3, ref.name)
    val rs = ps.executeQuery()
    try {
      if (!rs.next()) throw new NoSuchTableException(s"Table does not exist: $ref")
      rs.getString(1)
    } finally { rs.close(); ps.close() }
  }

  override def registerTable(ref: TableRef, metadataLocation: String): Unit = synchronized {
    if (!ref.namespace.isEmpty && !namespaceExists(ref.namespace))
      throw new NoSuchNamespaceException(s"Namespace does not exist: ${ref.namespace}")
    val ps = conn.prepareStatement(
      "INSERT INTO graft_tables (catalog_name, table_namespace, table_name, metadata_location) VALUES (?, ?, ?, ?)")
    ps.setString(1, name); ps.setString(2, nsKey(ref.namespace))
    ps.setString(3, ref.name); ps.setString(4, metadataLocation)
    try ps.executeUpdate()
    catch {
      case e: SQLException if isDuplicateKey(e) =>
        throw new AlreadyExistsException(s"Table already exists: $ref")
    } finally ps.close()
  }

  override def dropTable(ref: TableRef): Boolean = synchronized {
    val ps = conn.prepareStatement(
      "DELETE FROM graft_tables WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?")
    ps.setString(1, name); ps.setString(2, nsKey(ref.namespace)); ps.setString(3, ref.name)
    try ps.executeUpdate() > 0 finally ps.close()
  }

  override def close(): Unit = synchronized {
    try conn.close() catch { case _: SQLException => () }
  }
}
