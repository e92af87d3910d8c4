package graft.catalog

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The migrator scenario matrix against the GLUE catalog kind — the
  * reference's 9th and last (CatalogMigrationUtil.java:36-46), with
  * [[MemoryGlueApi]] standing in for the AWS service behind the
  * [[GlueApi]] seam. The model under test is the public Iceberg
  * GlueCatalog layout: single-level databases, table items whose
  * `metadata_location` parameter is the pointer, version-id optimistic
  * locking on updates. */
class GlueCatalogSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def uid(): String =
    java.util.UUID.randomUUID().toString.take(8).replace("-", "")

  private def glueCfg(catName: String = s"gc${uid()}"): CatalogConfig =
    CatalogConfig("glue", catName, Map("store" -> s"glue-${uid()}"))

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

  test("namespace and pointer semantics: single-level databases, Iceberg item layout") {
    val cfg = glueCfg()
    val cat = CatalogFactory.build(cfg)
    try {
      cat.createNamespace(Namespace.of("a"))
      intercept[AlreadyExistsException](cat.createNamespace(Namespace.of("a")))
      // Glue databases have no nesting — the Hive limitation, verbatim
      intercept[IllegalArgumentException](cat.createNamespace(Namespace.of("a", "b")))
      assert(cat.listNamespaces(Namespace.empty) == Seq(Namespace.of("a")))
      assert(cat.listNamespaces(Namespace.of("a")).isEmpty)
      intercept[NoSuchNamespaceException](cat.listNamespaces(Namespace.of("zz")))

      val ref = TableRef.parse("a.t1")
      intercept[NoSuchTableException](cat.loadTableMetadataLocation(ref))
      intercept[NoSuchNamespaceException](
        cat.registerTable(TableRef.parse("zz.t"), "loc"))
      cat.registerTable(ref, "/meta/v1.metadata.json")
      assert(cat.loadTableMetadataLocation(ref) == "/meta/v1.metadata.json")
      intercept[AlreadyExistsException](cat.registerTable(ref, "other"))
      assert(cat.listTables(Namespace.of("a")) == Seq(ref))
      // the stored item follows the public Iceberg Glue convention
      val item = MemoryGlueApi.forId(cfg.properties("store")).getTable("a", "t1").get
      assert(item.tableType == "EXTERNAL_TABLE" &&
        item.parameters(GlueCatalog.TableType) == "ICEBERG" &&
        item.parameters(GlueCatalog.MetadataLocation) == "/meta/v1.metadata.json")
      assert(cat.dropTable(ref))
      assert(!cat.dropTable(ref))
    } finally cat.close()
  }

  test("pointer commit is version-id optimistic locking: a stale committer loses") {
    val cfg = glueCfg()
    val cat = CatalogFactory.build(cfg).asInstanceOf[GlueCatalog]
    try {
      cat.createNamespace(Namespace.of("db"))
      val ref = TableRef.parse("db.t")
      cat.registerTable(ref, "v1.json")
      assert(cat.replaceTablePointer(ref, "v1.json", "v2.json"))
      // a committer that read v1 must lose: pointer stays v2
      assert(!cat.replaceTablePointer(ref, "v1.json", "v2b.json"))
      assert(cat.loadTableMetadataLocation(ref) == "v2.json")
      // re-read + retry against the fresh value wins
      assert(cat.replaceTablePointer(ref, "v2.json", "v3.json"))
      assert(cat.loadTableMetadataLocation(ref) == "v3.json")
    } finally cat.close()
  }

  test("full migrate mem->glue: registered via executors, source deleted, data readable") {
    val srcCfg = CatalogConfig("memory", s"mem-${uid()}")
    seedCanonical(srcCfg)
    val tgtCfg = glueCfg()
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
      val loc = tgt.loadTableMetadataLocation(TableRef.parse("bar.tbl3"))
      val rows = spark.read.parquet(CatalogIO.readDataLocation(loc))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(rows == Seq(3L, 6L, 9L, 12L, 15L))
    } finally tgt.close()
    val src = CatalogFactory.build(srcCfg)
    try assert(src.listTables(Namespace.of("foo")).isEmpty)
    finally src.close()
  }

  test("multi-level identifiers refuse against the single-level model (Hive parity)") {
    val cfg = glueCfg()
    seedCanonical(cfg)
    val cat = CatalogFactory.build(cfg)
    try {
      intercept[IllegalArgumentException](
        cat.loadTableMetadataLocation(TableRef(Namespace.of("a", "b"), "t")))
      assert(!cat.tableExists(TableRef(Namespace.of("a", "b"), "t")))
      assert(!cat.namespaceExists(Namespace.of("a", "b")))
    } finally cat.close()
  }

  test("CLI migrate into a glue target: exit 0, items land in the fake service") {
    val srcCfg = CatalogConfig("memory", s"mem-${uid()}")
    seedCanonical(srcCfg)
    val storeId = s"glue-${uid()}"
    val outDir = Files.createTempDirectory("graft-glue-cli").toString
    val code = graft.cli.CatalogMigrationCLI.run(Seq("migrate",
      "--source-catalog-type", "memory",
      "--source-catalog-properties", s"name=${srcCfg.name}",
      "--target-catalog-type", "glue",
      "--target-catalog-properties", s"store=$storeId",
      "--disable-safety-prompts", "--output-dir", outDir),
      readLine = () => "yes", out = _ => ())
    assert(code == 0)
    val api = MemoryGlueApi.forId(storeId)
    assert(api.getDatabases().map(_.name) == Seq("bar", "foo"))
    assert(api.getTables("foo").map(_.name) == Seq("tbl1", "tbl2"))
    assert(api.getTable("bar", "tbl3").get
      .parameters.contains(GlueCatalog.MetadataLocation))
  }
}
