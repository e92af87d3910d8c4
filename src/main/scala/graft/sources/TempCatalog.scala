package graft.sources

import org.apache.spark.sql.SparkSession

/** Throwaway DSv2 catalog lifecycle, shared by every caller that needs a
  * scratch warehouse (the w01 driver query, ScaleSmoke's write
  * experiment, ad-hoc demos): register a [[GraftSparkCatalog]] over a
  * fresh temp directory, run the body with the catalog name, then unset
  * the session conf keys and reclaim the directory — one point of truth
  * for the conf-key set and the teardown. */
object TempCatalog {

  /** [[withTemp]] plus the underlying [[graft.catalog.HadoopFsCatalog]]
    * handle, for callers that drive library faces (MergeOps, compaction)
    * against the same warehouse the SQL catalog serves. */
  def withTempHandles[T](spark: SparkSession, prefix: String = "graft-tmpcat")(
      f: (String, graft.catalog.HadoopFsCatalog) => T): T =
    withTemp(spark, prefix) { cat =>
      val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
      f(cat, new graft.catalog.HadoopFsCatalog(cat, wh))
    }

  def withTemp[T](spark: SparkSession, prefix: String = "graft-tmpcat")(
      f: String => T): T = {
    val wh = java.nio.file.Files.createTempDirectory(prefix).toString
    val cat = s"g${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftSparkCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.type", "hadoop")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try f(cat)
    finally {
      Seq("", ".type", ".warehouse")
        .foreach(s => spark.conf.unset(s"spark.sql.catalog.$cat$s"))
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(wh)).iterator().asScala
          .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Exception => () }
    }
  }
}
