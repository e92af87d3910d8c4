package graft.catalog

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Per-file constant FILLS over NATIVE avro data files (round 19): the
  * engine's sync-split avro decoder NULL-fills fields absent from a
  * record, so the constant injection wraps its reader exactly like the
  * parquet/orc readers — the v3 `ADD COLUMN ... initial-default` shape
  * on an avro table, and the mixed partitioned layouts the round-18
  * cross-format append guards used to refuse (avro appends onto
  * fill-bearing tables, parquet appends onto partitioned avro bases).
  * Fills + live deletes over avro entries still refuse (the avro
  * counting-read MOR does not thread constants); renames keep
  * refusing everywhere fills live. */
class AvroFillSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def conf = spark.sessionState.newHadoopConf()

  private def df(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo to hi).map(i => (i.toLong, s"n-$i")).toDF("id", "name")
  }

  private def rows(d: org.apache.spark.sql.DataFrame): Seq[String] =
    d.collect().map(_.toString).sorted.toSeq

  test("v3 ADD COLUMN initial-default on an AVRO table: existing rows " +
      "serve the constant on both faces; new appends carry the column") {
    val base = Files.createTempDirectory("graft-avrofill").toString
    val meta0 = IcebergExport.writeTable(spark, df(1, 30), s"$base/t",
      fileFormat = "avro")
    val meta1 = IcebergExport.addColumn(spark, meta0, "score", "int",
      initialDefault = Some("7"))
    val layout = CatalogIO.readLayout(meta1, conf)
    assert(layout.dataFormat == "avro" && layout.hasFills,
      s"the default must read back as per-file fills: $layout")
    // DataFrame face: every pre-addition row serves 7
    val got = CatalogIO.scanMetadataLocation(spark, meta1)
    assert(got.count() == 30L)
    assert(got.filter("score = 7").count() == 30L)
    // SQL face through a registered pointer, with a fill-column filter
    // (group pruning + constant injection) and a data-column filter
    graft.sources.TempCatalog.withTempHandles(spark, "graft-avrofill") {
      (cat, hc) =>
        spark.sql(s"CREATE NAMESPACE $cat.db")
        hc.registerTable(TableRef.parse("db.af"), meta1)
        assert(spark.sql(
          s"SELECT SUM(score) FROM $cat.db.af").head.getLong(0) == 210L)
        assert(spark.sql(
          s"SELECT COUNT(*) FROM $cat.db.af WHERE score = 7")
          .head.getLong(0) == 30L)
        assert(spark.sql(
          s"SELECT COUNT(*) FROM $cat.db.af WHERE score = 99")
          .head.getLong(0) == 0L, "a contradicted fill group must prune")
        assert(spark.sql(
          s"SELECT name FROM $cat.db.af WHERE id = 3").head.getString(0)
          == "n-3")
    }
    // an avro append AFTER the addition carries the column physically
    // (fill-free entry); the mixed fill/fill-free groups union
    val appendDf = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(101L, "n-101",
        Int.box(42))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT NOT NULL, name STRING, score INT"))
    val meta2 = IcebergExport.appendSnapshot(spark, appendDf, meta1,
      fileFormat = "avro")
    val got2 = CatalogIO.scanMetadataLocation(spark, meta2)
    assert(got2.count() == 31L)
    assert(got2.filter("score = 42").count() == 1L)
    assert(got2.filter("score = 7").count() == 30L)
  }

  test("fills + live deletes over avro entries refuse loudly") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-avrofill-del").toString
    val meta0 = IcebergExport.writeTable(spark, df(1, 20), s"$base/t",
      fileFormat = "avro")
    val meta1 = IcebergExport.addColumn(spark, meta0, "score", "int",
      initialDefault = Some("7"))
    val meta2 = IcebergExport.appendDeletes(spark, meta1,
      equality = Some(Seq(1L).toDF("id")))
    val e = intercept[Exception] {
      CatalogIO.readLayout(meta2, conf)
    }
    assert(e.getMessage.contains("fills + live deletes over avro"),
      e.getMessage)
  }
}
