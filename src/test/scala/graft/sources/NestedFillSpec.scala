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
}
