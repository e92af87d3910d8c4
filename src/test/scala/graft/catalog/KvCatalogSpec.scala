package graft.catalog

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The migrator scenario matrix against the KV catalog — the
  * conditional-write item-store model of the reference's DYNAMODB and
  * ECS kinds (CatalogMigrationUtil.java:36-46), with [[MemoryKvStore]]
  * standing in for the cloud store behind the [[KvStore]] seam.
  * Register races resolve in the store (exactly one conditional create
  * wins), and pointer commits are value-checked CAS — the two
  * behaviors that make the model a catalog rather than a map. */
class KvCatalogSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def uid(): String =
    java.util.UUID.randomUUID().toString.take(8).replace("-", "")

  private def kvCfg(catName: String = s"kc${uid()}"): CatalogConfig =
    CatalogConfig("kv", catName, Map("store" -> s"store-${uid()}"))

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
    val cat = CatalogFactory.build(kvCfg())
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
      // the register race resolves in the store: second conditional
      // create loses
      intercept[AlreadyExistsException](cat.registerTable(ref, "other"))
      assert(cat.listTables(Namespace.of("a")) == Seq(ref))
      // a sibling namespace sharing a dotted prefix never leaks into
      // the range scan (a vs a.b)
      cat.registerTable(TableRef(Namespace.of("a", "b"), "t2"), "loc2")
      assert(cat.listTables(Namespace.of("a")) == Seq(ref))
      assert(cat.dropTable(ref))
      assert(!cat.dropTable(ref))
    } finally cat.close()
  }

  test("pointer commit is value-checked CAS: a stale committer loses") {
    val cfg = kvCfg()
    val cat = CatalogFactory.build(cfg).asInstanceOf[KvCatalog]
    try {
      cat.createNamespace(Namespace.of("db"))
      val ref = TableRef.parse("db.t")
      cat.registerTable(ref, "v1.json")
      // committer A read v1 and lands v2
      assert(cat.replaceTablePointer(ref, "v1.json", "v2.json"))
      // committer B also read v1: its CAS must fail, pointer stays v2
      assert(!cat.replaceTablePointer(ref, "v1.json", "v2b.json"))
      assert(cat.loadTableMetadataLocation(ref) == "v2.json")
      // B re-reads and retries against the fresh value
      assert(cat.replaceTablePointer(ref, "v2.json", "v3.json"))
      assert(cat.loadTableMetadataLocation(ref) == "v3.json")
    } finally cat.close()
  }

  test("two catalog names share one store without seeing each other") {
    val cfg1 = kvCfg()
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

  test("full migrate mem->kv: registered via executors, source deleted, data readable") {
    val srcCfg = CatalogConfig("memory", s"mem-${uid()}")
    seedCanonical(srcCfg)
    val tgtCfg = kvCfg()
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

  test("CLI migrate into a kv target: exit 0, pointers land in the store") {
    val srcCfg = CatalogConfig("memory", s"mem-${uid()}")
    seedCanonical(srcCfg)
    val storeId = s"store-${uid()}"
    val outDir = Files.createTempDirectory("graft-kv-cli").toString
    val code = graft.cli.CatalogMigrationCLI.run(Seq("migrate",
      "--source-catalog-type", "memory",
      "--source-catalog-properties", s"name=${srcCfg.name}",
      "--target-catalog-type", "kv",
      "--target-catalog-properties", s"store=$storeId",
      "--disable-safety-prompts", "--output-dir", outDir),
      readLine = () => "yes", out = _ => ())
    assert(code == 0)
    // the CLI names its target catalog "target-<type>"
    val tgt = new KvCatalog("target-kv", MemoryKvStore.forId(storeId))
    try assert(tgt.listTables(Namespace.of("foo")).map(_.toString).toSet ==
      Set("foo.tbl1", "foo.tbl2"))
    finally tgt.close()
  }
}
