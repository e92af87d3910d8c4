package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All engine queries read through here so that, at cluster scale, the
  * single place to swap `spark.read.parquet(dir)` for a catalog-backed
  * `spark.table(...)` (see [[graft.catalog]]) is this object.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is physically TIMESTAMP(NANOS), which Spark's parquet
    // reader only accepts as a long (spark.sql.legacy.parquet.nanosAsLong,
    // set in Verify/Bench). Normalize to a proper timestamp (µs precision).
    if (name == "events" &&
      df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
