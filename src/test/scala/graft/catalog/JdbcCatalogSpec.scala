package graft.catalog

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The migrator scenario matrix against a REAL relational backend: a
  * Derby-embedded [[JdbcCatalog]] (Derby ships with Spark, so this runs
  * offline). Mirrors the reference's JDBC catalog kind
  * (CatalogMigrationUtil.java:36-46 → Iceberg JdbcCatalog); the layout —
  * catalog-scoped pointer table + namespace table — follows that public
  * shape. Every catalog RPC issued from executor partitions inside
  * `registerTables`' mapPartitions opens its own embedded connection,
  * the same per-executor-instance pattern the REST client face uses. */
class JdbcCatalogSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def uid(): String =
    java.util.UUID.randomUUID().toString.take(8).replace("-", "")

  /** One Derby database per test, fresh on disk. */
  private def jdbcCfg(catName: String = s"jc${uid()}"): CatalogConfig = {
    val db = Files.createTempDirectory("graft-derby").resolve("db").toString
    CatalogConfig("jdbc", catName, Map("uri" -> s"jdbc:derby:$db;create=true"))
  }

  private def seedCanonical(cfg: CatalogConfig): Unit = {
    val stage = new HadoopFsCatalog(s"stage-${uid()}",
      Files.createTempDirectory("graft-stage").toString)
    val cat = CatalogFactory.build(cfg)
    try {
      Seq("foo", "bar").foreach(ns => cat.createNamespace(Namespace.of(ns)))
      import spark.implicits._
      Seq("foo.tbl1", "foo.tbl2", "bar.tbl3", "bar.tbl4").map(TableRef.parse)
        .zipWithIndex.foreach { case (ref, i) =>
          val df = (1L to 5L).map(x => x * (i + 1)).toDF("id")
          cat.registerTable(ref, CatalogIO.createTable(spark, stage, ref, df))
        }
    } finally cat.close()
  }

  test("namespace and pointer semantics match the other backends") {
    val cfg = jdbcCfg()
    val cat = CatalogFactory.build(cfg)
    try {
      cat.createNamespace(Namespace.of("a"))
      cat.createNamespace(Namespace.of("a", "b"))
      intercept[AlreadyExistsException](cat.createNamespace(Namespace.of("a")))
      assert(cat.listNamespaces(Namespace.empty) == Seq(Namespace.of("a")))
      assert(cat.listNamespaces(Namespace.of("a")) == Seq(Namespace.of("a", "b")))
      intercept[NoSuchNamespaceException](cat.listNamespaces(Namespace.of("zz")))

      val ref = TableRef.parse("a.t1")
      intercept[NoSuchTableException](cat.loadTableMetadataLocation(ref))
      intercept[NoSuchNamespaceException](
        cat.registerTable(TableRef.parse("zz.t"), "loc"))
      cat.registerTable(ref, "/meta/v1.metadata.json")
      assert(cat.loadTableMetadataLocation(ref) == "/meta/v1.metadata.json")
      // the register race resolves in the database: second write loses
      intercept[AlreadyExistsException](cat.registerTable(ref, "other"))
      assert(cat.listTables(Namespace.of("a")) == Seq(ref))
      assert(cat.dropTable(ref))
      assert(!cat.dropTable(ref))
    } finally cat.close()
  }

  test("two catalog names share one database without seeing each other") {
    val cfg1 = jdbcCfg()
    val cfg2 = cfg1.copy(name = s"other${uid()}")
    val (c1, c2) = (CatalogFactory.build(cfg1), CatalogFactory.build(cfg2))
    try {
      c1.createNamespace(Namespace.of("db"))
      c1.registerTable(TableRef.parse("db.t"), "loc1")
      assert(!c2.namespaceExists(Namespace.of("db")))
      c2.createNamespace(Namespace.of("db"))
      assert(c2.listTables(Namespace.of("db")).isEmpty)
      c2.registerTable(TableRef.parse("db.t"), "loc2")
      assert(c1.loadTableMetadataLocation(TableRef.parse("db.t")) == "loc1")
      assert(c2.loadTableMetadataLocation(TableRef.parse("db.t")) == "loc2")
    } finally { c1.close(); c2.close() }
  }

  test("full migrate mem→jdbc: registered via SQL, source deleted, data readable") {
    val srcCfg = CatalogConfig("memory", s"mem-${uid()}")
    seedCanonical(srcCfg)
    val tgtCfg = jdbcCfg()
    val m = new CatalogMigrator(srcCfg, tgtCfg, deleteEntriesFromSourceCatalog = true)
    val ids = m.getMatchingTableIdentifiers(None)
    assert(ids.map(_.toString).toSet ==
      Set("foo.tbl1", "foo.tbl2", "bar.tbl3", "bar.tbl4"))
    m.registerTables(spark, ids)
    val r = m.result()
    assert(r.registeredTableIdentifiers.size == 4)
    assert(r.failedToRegisterTableIdentifiers.isEmpty)
    assert(r.failedToDeleteTableIdentifiers.isEmpty)
    val tgt = CatalogFactory.build(tgtCfg)
    try {
      assert(tgt.listTables(Namespace.of("foo")).map(_.toString).toSet ==
        Set("foo.tbl1", "foo.tbl2"))
      // the migrated pointer serves the original rows
      val loc = tgt.loadTableMetadataLocation(TableRef.parse("bar.tbl3"))
      val rows = spark.read.parquet(CatalogIO.readDataLocation(loc))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(rows == Seq(3L, 6L, 9L, 12L, 15L))
    } finally tgt.close()
    val src = CatalogFactory.build(srcCfg)
    try assert(src.listTables(Namespace.of("foo")).isEmpty)
    finally src.close()
  }

  test("CLI migrate into a jdbc target: exit 0, pointers land in Derby") {
    val srcCfg = CatalogConfig("memory", s"mem-${uid()}")
    seedCanonical(srcCfg)
    val tgtCfg = jdbcCfg()
    val outDir = Files.createTempDirectory("graft-jdbc-cli").toString
    val code = graft.cli.CatalogMigrationCLI.run(Seq("migrate",
      "--source-catalog-type", "memory",
      "--source-catalog-properties", s"name=${srcCfg.name}",
      "--target-catalog-type", "jdbc",
      "--target-catalog-properties", s"uri=${tgtCfg.properties("uri")}",
      "--disable-safety-prompts", "--output-dir", outDir),
      readLine = () => "yes", out = _ => ())
    assert(code == 0)
    // the CLI names its target catalog "target-<type>"; read back through
    // the same uri under that name
    val tgt = new JdbcCatalog("target-jdbc", tgtCfg.properties("uri"))
    try assert(tgt.listTables(Namespace.of("foo")).map(_.toString).toSet ==
      Set("foo.tbl1", "foo.tbl2"))
    finally tgt.close()
  }

  test("jdbc→jdbc migrate across two databases") {
    val srcCfg = jdbcCfg()
    seedCanonical(srcCfg)
    val tgtCfg = jdbcCfg()
    val m = new CatalogMigrator(srcCfg, tgtCfg, deleteEntriesFromSourceCatalog = false)
    m.registerTables(spark, m.getMatchingTableIdentifiers(Some("foo\\..*")))
    val r = m.result()
    assert(r.registeredTableIdentifiers.map(_.toString).toSet ==
      Set("foo.tbl1", "foo.tbl2"))
    val tgt = CatalogFactory.build(tgtCfg)
    try assert(tgt.listTables(Namespace.of("foo")).size == 2)
    finally tgt.close()
  }
}
