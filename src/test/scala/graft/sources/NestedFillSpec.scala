package graft.sources

import graft.TestSpark
import graft.catalog.{IcebergExport, TableRef}
import org.scalatest.funsuite.AnyFunSuite

/** Regression matrix for NESTED initial-default injection (round 17):
  * the same query must serve the constant under every execution shape —
  * codegen on/off × nested-vectorized reader on/off (the columnar path
  * exercises the child-override vector, incl. Spark's per-batch
  * closeIfFreeable call from codegen'd ColumnarToRow, which originally
  * freed the reader-owned vectors through the wrapper). */
class NestedFillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("nested fill serves under codegen/vectorization matrix") {
    graft.sources.TempCatalog.withTempHandles(spark, "graft-nfill") { (cat, hc) =>
      val dir = java.nio.file.Files.createTempDirectory("nfill").toString + "/t"
      val base = spark.sql(
        """SELECT id, CASE WHEN id % 5 = 0 THEN NULL
          |ELSE named_struct('a', id * 10, 'b', concat('v-', id)) END AS s
          |FROM range(1, 21)""".stripMargin)
      val meta1 = IcebergExport.writeTable(spark, base, dir)
      val meta2 = IcebergExport.addColumn(spark, meta1, "x", "int",
        initialDefault = Some("7"), parentPath = Seq("s"))
      spark.sql(s"CREATE NAMESPACE $cat.db")
      hc.registerTable(TableRef.parse("db.nf"), meta2)
      for (codegen <- Seq("true", "false"); vec <- Seq("true", "false")) {
        spark.conf.set("spark.sql.codegen.wholeStage", codegen)
        spark.conf.set(
          "spark.sql.parquet.enableNestedColumnVectorizedReader", vec)
        try {
          assert(spark.sql(
            s"SELECT count(*) c FROM $cat.db.nf WHERE s.x = 7")
            .head.getLong(0) == 16L, s"codegen=$codegen vec=$vec")
          assert(spark.sql(
            s"SELECT sum(s.x) v FROM $cat.db.nf").head.getLong(0) == 112L,
            s"codegen=$codegen vec=$vec")
        } finally {
          spark.conf.unset("spark.sql.codegen.wholeStage")
          spark.conf.unset(
            "spark.sql.parquet.enableNestedColumnVectorizedReader")
        }
      }
    }
  }
  test("nested fills compose with live equality deletes (MOR probes " +
      "above the injection) and with the lineage face") {
    graft.sources.TempCatalog.withTempHandles(spark, "graft-nfmor") { (cat, hc) =>
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("nfmor").toString + "/t"
      val base = spark.sql(
        """SELECT id, named_struct('a', id * 10) AS s FROM range(1, 21)""")
      val meta1 = IcebergExport.writeTable(spark, base, dir)
      val meta2 = IcebergExport.addColumn(spark, meta1, "x", "int",
        initialDefault = Some("7"), parentPath = Seq("s"))
      // a global equality delete on the top-level id — the probe runs
      // ABOVE the nested injection on every scan face
      val meta3 = IcebergExport.appendDeletes(spark, meta2,
        equality = Some(Seq(3L, 4L).toDF("id")))
      spark.sql(s"CREATE NAMESPACE $cat.db")
      hc.registerTable(TableRef.parse("db.nfm"), meta3)
      assert(spark.sql(s"SELECT sum(s.x) v FROM $cat.db.nfm")
        .head.getLong(0) == 18L * 7)
      assert(spark.sql(s"SELECT count(*) c FROM $cat.db.nfm " +
        "WHERE id IN (3, 4)").head.getLong(0) == 0L)
      // library face agrees
      assert(graft.catalog.CatalogIO.scanMetadataLocation(spark, meta3)
        .selectExpr("sum(s.x)").head.getLong(0) == 18L * 7)
      // lineage face (v3 from the addColumn raise): survivors keep the
      // nested constant; deleted ids are gone
      val lin = graft.catalog.CatalogIO.scanIcebergLineage(spark, meta3)
      assert(lin.selectExpr("sum(s.x)").head.getLong(0) == 18L * 7)
      assert(lin.filter("id IN (3, 4)").count() == 0L)
    }
  }

  test("the SQL lineage face serves ORC equality-delete files " +
      "(format-dispatched tuple reads)") {
    graft.sources.TempCatalog.withTempHandles(spark, "graft-orclin") { (cat, hc) =>
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("orclin").toString + "/t"
      val meta1 = IcebergExport.writeTable(spark,
        spark.sql("SELECT id, id * 2 AS v FROM range(1, 11)").coalesce(1), dir)
      // v3 via addColumn (lineage exists from v3)
      val meta2 = IcebergExport.addColumn(spark, meta1, "w", "int",
        initialDefault = Some("1"))
      // an ORC-file equality delete (write.delete.format = orc)
      val meta3 = IcebergExport.appendDeletes(spark, meta2,
        equality = Some(Seq(2L, 3L).toDF("id")), fileFormat = "orc")
      spark.sql(s"CREATE NAMESPACE $cat.db")
      hc.registerTable(TableRef.parse("db.ol"), meta3)
      assert(spark.sql(s"SELECT id FROM $cat.db.ol " +
        "WHERE _row_id IS NULL OR _row_id IS NOT NULL").collect()
        .map(_.getLong(0)).toSet == (1L to 10L).toSet -- Set(2L, 3L))
      // the library lineage face too
      assert(graft.catalog.CatalogIO.scanIcebergLineage(spark, meta3)
        .select("id").collect().map(_.getLong(0)).toSet ==
        (1L to 10L).toSet -- Set(2L, 3L))
    }
  }

}
