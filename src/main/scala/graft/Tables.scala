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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    normalize(spark.read.parquet(s"$dir/$name.parquet"), name)

  /** Normalize driver-provided physical types to the engine's logical schema.
    *
    * The driver has served `events.ts` under several physical encodings
    * across re-provisions:
    *   - TIMESTAMP(NANOS): Spark's reader only accepts it as a long
    *     (spark.sql.legacy.parquet.nanosAsLong, set in Verify/Bench) —
    *     rebuild a µs timestamp from it;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads it as
    *     TIMESTAMP_NTZ — cast to TIMESTAMP. The session timezone is pinned
    *     to UTC everywhere (Verify/Bench/specs), so the cast is
    *     value-identity and the tz-naive DuckDB oracle is unaffected.
    *
    * The NTZ cast applies to every timestamp column of every table so a
    * future driver flip on another column degrades to a no-op, not an
    * AnalysisException at `unix_micros`. Streaming reads share this via
    * [[normalize]] (see [[graft.streaming.EventStreams]]).
    */
  def normalize(df: DataFrame, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val nanosFixed =
      if (name == "events" && df.schema("ts").dataType == LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    val ntzCols = nanosFixed.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }
    ntzCols.foldLeft(nanosFixed) { (acc, c) =>
      acc.withColumn(c, col(c).cast(TimestampType))
    }
  }
}
