package graft.catalog

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The reference's Hive quirk matrix against a REAL in-process Hive
  * metastore (Derby-backed — both ship with Spark):
  * `ITHadoopToHiveCatalogMigrator.java:49-66` (nested namespaces fail to
  * register, single-level succeed) and
  * `ITNessieToHiveCatalogMigrator.java:48-66` (the empty namespace is
  * refused). Previously these semantics were only emulated by
  * MemoryCatalog's single-level config. */
class HiveCatalogSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def uid(): String =
    java.util.UUID.randomUUID().toString.take(8).replace("-", "")

  /** One embedded metastore for the whole suite (Derby registry-shared). */
  private lazy val hiveCfg: CatalogConfig = {
    val root = Files.createTempDirectory("graft-hive").toString
    CatalogConfig("hive", s"hive${uid()}",
      Map("metastore-dir" -> s"$root/ms", "warehouse" -> s"$root/wh"))
  }
  private lazy val hive = CatalogFactory.build(hiveCfg)

  test("databases are single-level namespaces; default exists; pointers round-trip") {
    assert(hive.listNamespaces(Namespace.empty).contains(Namespace.of("default")))
    val ns = Namespace.of(s"db${uid()}")
    hive.createNamespace(ns)
    intercept[AlreadyExistsException](hive.createNamespace(ns))
    intercept[IllegalArgumentException](
      hive.createNamespace(Namespace.of("a", "b")))
    assert(hive.listNamespaces(ns).isEmpty) // databases have no children
    intercept[NoSuchNamespaceException](hive.listNamespaces(Namespace.of("zz")))

    val ref = TableRef(ns, "t1")
    intercept[NoSuchTableException](hive.loadTableMetadataLocation(ref))
    hive.registerTable(ref, "/meta/v3.metadata.json")
    assert(hive.loadTableMetadataLocation(ref) == "/meta/v3.metadata.json")
    intercept[AlreadyExistsException](hive.registerTable(ref, "other"))
    assert(hive.listTables(ns) == Seq(ref))
    assert(hive.dropTable(ref))
    assert(!hive.dropTable(ref))
  }

  test("nested-namespace tables fail-soft; single-level migrate cleanly (ITHadoopToHive :49-66)") {
    val srcCfg = CatalogConfig("memory", s"mem-${uid()}")
    val src = CatalogFactory.build(srcCfg)
    val stage = new HadoopFsCatalog(s"stage-${uid()}",
      Files.createTempDirectory("graft-stage").toString)
    import spark.implicits._
    src.createNamespace(Namespace.of("foo"))
    src.createNamespace(Namespace.of("db1"))
    src.createNamespace(Namespace.of("db1", "ns1"))
    Seq("foo.tbl1", "foo.tbl2", "db1.ns1.deep1", "db1.ns1.deep2").map(TableRef.parse)
      .foreach { ref =>
        src.registerTable(ref,
          CatalogIO.createTable(spark, stage, ref, Seq(1L, 2L).toDF("id")))
      }

    val m = new CatalogMigrator(srcCfg, hiveCfg, deleteEntriesFromSourceCatalog = false)
    m.registerTables(spark, m.getMatchingTableIdentifiers(None))
    val r = m.result()
    assert(r.registeredTableIdentifiers.map(_.toString).toSet ==
      Set("foo.tbl1", "foo.tbl2"))
    assert(r.failedToRegisterTableIdentifiers.map(_.toString).toSet ==
      Set("db1.ns1.deep1", "db1.ns1.deep2"))
    assert(hive.listTables(Namespace.of("foo")).map(_.name).toSet ==
      Set("tbl1", "tbl2"))
    // the migrated pointer serves the original rows
    val loc = hive.loadTableMetadataLocation(TableRef.parse("foo.tbl1"))
    assert(spark.read.parquet(CatalogIO.readDataLocation(loc))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("empty namespace is refused (ITNessieToHive :48-66)") {
    intercept[NoSuchNamespaceException](hive.listTables(Namespace.empty))
    intercept[NoSuchNamespaceException](
      hive.registerTable(TableRef(Namespace.empty, "rootless"), "loc"))
  }

  test("hive→memory migrate reads back through the metastore") {
    val ns = Namespace.of(s"mig${uid()}")
    hive.createNamespace(ns)
    val stage = new HadoopFsCatalog(s"stage-${uid()}",
      Files.createTempDirectory("graft-stage").toString)
    import spark.implicits._
    val ref = TableRef(ns, "t")
    hive.registerTable(ref,
      CatalogIO.createTable(spark, stage, ref, Seq(7L, 9L).toDF("id")))

    val tgtCfg = CatalogConfig("memory", s"mem-${uid()}")
    val m = new CatalogMigrator(hiveCfg, tgtCfg, deleteEntriesFromSourceCatalog = false)
    val ids = m.getMatchingTableIdentifiers(Some(s"${ns.levels.head}\\..*"))
    assert(ids == Seq(ref))
    m.registerTables(spark, ids)
    assert(m.result().registeredTableIdentifiers == Seq(ref))
    val tgt = CatalogFactory.build(tgtCfg)
    assert(tgt.loadTableMetadataLocation(ref) == hive.loadTableMetadataLocation(ref))
  }
}
