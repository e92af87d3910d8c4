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
      deleteRecursively(wh)
    }
  }

  /** Best-effort recursive teardown of a temp tree (deepest first); the
    * walk stream is closed so directory handles never outlive the call.
    * Shared by every throwaway-warehouse face — a second inline copy
    * (w04 had one) drifts. */
  private[graft] def deleteRecursively(root: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try stream.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally stream.close()
    } catch { case _: Exception => () }
}
