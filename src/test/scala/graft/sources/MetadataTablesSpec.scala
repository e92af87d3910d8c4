package graft.sources

import java.nio.file.Files

import graft.TestSpark
import graft.catalog.{HadoopFsCatalog, Namespace, TableRef}
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg-style metadata tables (`db.t.files` / `db.t.history`)
  * through the DSv2 catalog: answered from metadata alone, planned as
  * LocalTableScan, and always shadowed by a real table of the same
  * name. */
class MetadataTablesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshCatalog(): (String, HadoopFsCatalog) = {
    val wh = Files.createTempDirectory("meta-wh").toString
    val name = s"md${java.util.UUID.randomUUID().toString.take(8).replace("-", "")}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.type", "hadoop")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $name.db")
    (name, new HadoopFsCatalog(name, wh))
  }

  test("history and files reflect commits, stats, and merge-on-read state") {
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.db.t USING parquet AS " +
      "SELECT /*+ COALESCE(1) */ id AS k FROM range(0, 1000)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT /*+ COALESCE(1) */ id FROM range(1000, 2000)")

    val hist = spark.table(s"$cat.db.t.history").orderBy("version").collect()
    // v1 = CTAS's empty snapshot, v2 = the SELECT, v3 = the append
    assert(hist.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(hist.map(r => Option(r.get(2))).toSeq == Seq(Some(0), Some(1), Some(2)))
    assert(hist.forall(_.getInt(3) == 0)) // no delete files yet
    assert(hist.last.getString(5).endsWith("v3.metadata.json"))
    // each version's commit operation rides along (round 11): the CTAS
    // SELECT lands as an append onto the empty created v1
    assert(hist.map(_.getString(6)).toSeq == Seq("create", "append", "append"))

    val files = spark.table(s"$cat.db.t.files").collect()
    assert(files.length == 2)
    assert(files.forall(_.getLong(1) > 0)) // real sizes
    assert(files.forall(_.getLong(3) == 1000L)) // row counts from stats
    assert(files.forall(_.getString(4).contains("k["))) // bounds summary

    // the metadata faces plan as local scans — no data files touched
    assert(spark.table(s"$cat.db.t.files").queryExecution.executedPlan
      .toString.contains("LocalTableScan"))

    // a MOR delete commit shows up as a delete file in the new version
    MergeOps.deleteMatchedMergeOnRead(spark, hc, TableRef.parse("db.t"),
      spark.sql("SELECT CAST(5 AS BIGINT) AS k"), Seq("k"))
    val hist2 = spark.table(s"$cat.db.t.history").orderBy("version").collect()
    assert(hist2.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(hist2.last.getInt(3) == 1)
    assert(hist2.last.getString(6) == "delete")
  }

  test("partitions rolls up per-partition file/row/byte totals from metadata") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.db.p USING parquet PARTITIONED BY (g) AS " +
      "SELECT /*+ REPARTITION(1) */ id AS k, CAST(id % 3 AS STRING) AS g FROM range(0, 900)")
    val parts = spark.table(s"$cat.db.p.partitions").orderBy("partition").collect()
    assert(parts.length == 3)
    assert(parts.map(_.getString(0)).toSeq == Seq("g=0", "g=1", "g=2"))
    assert(parts.forall(_.getLong(2) == 300L)) // rows from stats
    assert(parts.forall(_.getLong(3) > 0L)) // bytes from the manifest
    // unpartitioned tables report one <all> row
    spark.sql(s"CREATE TABLE $cat.db.u USING parquet AS " +
      "SELECT /*+ COALESCE(1) */ id FROM range(0, 10)")
    val u = spark.table(s"$cat.db.u.partitions").collect()
    assert(u.length == 1 && u(0).getString(0) == "<all>" && u(0).getLong(2) == 10L)
  }

  test("files/partitions serve sizes from the manifest alone — zero filesystem reach") {
    // The round-10 implementation recursively listed the whole data tree
    // for byte sizes (O(files) object-store listing per introspection
    // query); sizes now live in the manifest. Proof of zero filesystem
    // dependence: DELETE the entire data tree, then read both metadata
    // tables — identical rows, sizes still real.
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.db.z USING parquet PARTITIONED BY (g) AS " +
      "SELECT /*+ REPARTITION(1) */ id AS k, CAST(id % 2 AS STRING) AS g FROM range(0, 100)")
    def snap(): (Seq[String], Seq[String]) = (
      spark.table(s"$cat.db.z.files").collect().map(_.mkString("|")).sorted.toSeq,
      spark.table(s"$cat.db.z.partitions").collect().map(_.mkString("|")).sorted.toSeq)
    val before = snap()
    assert(spark.table(s"$cat.db.z.files").collect().forall(_.getLong(1) > 0))
    val layout = graft.catalog.CatalogIO.readLayout(
      hc.loadTableMetadataLocation(TableRef.parse("db.z")))
    val dataPath = new org.apache.hadoop.fs.Path(layout.dataLocation)
    val fs = dataPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(fs.delete(dataPath, true), "data tree should exist")
    assert(snap() == before,
      "metadata tables must not depend on the live data tree")
  }

  test("a real table always shadows the metadata suffix; missing base errors") {
    val (cat, hc) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.db.sub USING parquet AS SELECT 1 AS a")
    // a REAL table named `files` under namespace db.sub (implicit in a
    // Hadoop warehouse — the table dir db/sub already implies it)
    spark.sql(s"CREATE TABLE $cat.db.sub.files USING parquet AS SELECT 42 AS shadow")
    val r = spark.table(s"$cat.db.sub.files").collect()
    assert(r.length == 1 && r(0).getInt(0) == 42)
    // but history (not shadowed) still serves the metadata face of db.sub
    assert(spark.table(s"$cat.db.sub.history").count() >= 1)
    // no base table -> ordinary table-not-found
    intercept[org.apache.spark.sql.AnalysisException](
      spark.table(s"$cat.db.nope.files").collect())
  }
}
