package graft.sources

import java.nio.file.Files

import graft.TestSpark
import graft.catalog.{CatalogConfig, CatalogFactory, CatalogIO, HadoopFsCatalog, TableRef}
import org.scalatest.funsuite.AnyFunSuite

/** SQL face of the engine's catalogs (SURVEY §2B E2): a Hadoop warehouse
  * surfaced through GraftSparkCatalog answers SELECT / SHOW NAMESPACES /
  * SHOW TABLES, and a migrated table serves identical rows from the
  * target catalog without data movement. */
class GraftSparkCatalogSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("SQL reads resolve pointer -> metadata -> parquet through DSv2") {
    val wh = Files.createTempDirectory("dsv2-wh").toString
    val cat = CatalogFactory.build(CatalogConfig("hadoop", "dsv2src",
      Map("warehouse" -> wh))).asInstanceOf[HadoopFsCatalog]
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    CatalogIO.createTable(spark, cat, TableRef.parse("db.t1"), df)
    CatalogIO.createTable(spark, cat, TableRef.parse("db.t2"), df.limit(1))

    spark.conf.set("spark.sql.catalog.gtest", classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtest.type", "hadoop")
    spark.conf.set("spark.sql.catalog.gtest.warehouse", wh)

    val got = spark.sql("SELECT id, v FROM gtest.db.t1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))

    val nss = spark.sql("SHOW NAMESPACES IN gtest").collect().map(_.getString(0)).toSet
    assert(nss == Set("db"))
    val tbls = spark.sql("SHOW TABLES IN gtest.db").collect().map(_.getString(1)).toSet
    assert(tbls == Set("t1", "t2"))

    // predicate pushdown reaches the parquet scan through the adapter
    val plan = spark.sql("SELECT id FROM gtest.db.t1 WHERE id = 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"), plan)

    cat.close()
  }

  test("a migrated table serves the same rows from the target catalog") {
    val whSrc = Files.createTempDirectory("dsv2-src").toString
    val whTgt = Files.createTempDirectory("dsv2-tgt").toString
    val src = CatalogFactory.build(CatalogConfig("hadoop", "s",
      Map("warehouse" -> whSrc))).asInstanceOf[HadoopFsCatalog]
    val tgt = CatalogFactory.build(CatalogConfig("hadoop", "t",
      Map("warehouse" -> whTgt))).asInstanceOf[HadoopFsCatalog]
    import spark.implicits._
    val ref = TableRef.parse("ns.tbl")
    CatalogIO.createTable(spark, src, ref,
      Seq((10L, 1.5), (20L, 2.5)).toDF("k", "x"))

    // register-mode migration: pointer copy only
    tgt.createNamespace(graft.catalog.Namespace.of("ns"))
    tgt.registerTable(ref, src.loadTableMetadataLocation(ref))

    spark.conf.set("spark.sql.catalog.gmig", classOf[GraftSparkCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmig.type", "hadoop")
    spark.conf.set("spark.sql.catalog.gmig.warehouse", whTgt)
    val got = spark.sql("SELECT k, x FROM gmig.ns.tbl ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((10L, 1.5), (20L, 2.5)))
    src.close(); tgt.close()
  }
}
