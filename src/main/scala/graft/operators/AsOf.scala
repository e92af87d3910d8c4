package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * composed from a union + running `last(_, ignoreNulls)` window instead
  * of a non-equi range join (SURVEY §4.2 preference (a)).
  *
  * The naive formulation — `left JOIN right ON key AND r.ts <= l.ts`,
  * then max per left row — explodes to |matches| rows before
  * re-aggregating; at 100 TB an unbounded range join is the classic
  * skew bomb. This shape instead unions the two sides tagged 0/1,
  * shuffles ONCE on the join key, sorts within partitions, and scans
  * forward carrying the latest right-side timestamp: cost is one shuffle
  * + one sort over |L|+|R| rows, no pair blowup, and AQE handles key
  * skew like any other window.
  */
object AsOf {

  /** For each left row, attach the greatest `rightTs` of the same `key`
    * with rightTs <= leftTs (ties at equal timestamps match). Null when
    * no prior right row exists, or — when `tolerance` is given (pandas
    * merge_asof semantics) — when the match is staler than the
    * tolerance: leftTs − rightTs > tolerance ⇒ null. For timestamp
    * columns pass an INTERVAL expression (e.g. `expr("INTERVAL 10
    * MINUTES")`); for numeric time columns a numeric one. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      tolerance: Option[Column] = None): DataFrame = {
    val lCols = left.columns.toIndexedSeq
    // the internal working columns and the output column must not collide
    // with caller columns — silent wrong results otherwise
    val reserved = Set("__ts", "__tag", "__rts", "__key", "__matched",
      "asof_" + rightTs)
    val clash = lCols.filter(reserved)
    require(clash.isEmpty,
      s"asofJoin: left columns ${clash.mkString(", ")} collide with " +
        s"reserved internal/output names (${reserved.mkString(", ")})")
    // the right side contributes (key, rightTs); either being a reserved
    // name would silently shadow a working column
    val rClash = Seq(key, rightTs).filter(reserved)
    require(rClash.isEmpty,
      s"asofJoin: key/rightTs ${rClash.mkString(", ")} collide with " +
        s"reserved internal/output names (${reserved.mkString(", ")})")
    val rTagged = right.select(col(key), col(rightTs).as("__ts"))
      .withColumn("__tag", lit(0))
      .withColumn("__rts", col("__ts"))
    val lTagged = left
      .withColumn("__ts", col(leftTs)).withColumn("__tag", lit(1))
      .withColumn("__rts", lit(null).cast(right.schema(rightTs).dataType))
    val unioned = lTagged.select(
      (lCols.map(col) :+ col(key).as("__key") :+ col("__ts") :+ col("__tag") :+ col("__rts")): _*)
      .union(rTagged.select(
        (lCols.map(c => lit(null).cast(left.schema(c).dataType)) :+
          col(key) :+ col("__ts") :+ col("__tag") :+ col("__rts")): _*))
    // right rows (tag 0) sort before left rows (tag 1) at equal ts, so an
    // equal-timestamp right row is visible to the left row.
    val w = Window.partitionBy(col("__key")).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = tolerance match {
      case None => col("__matched")
      case Some(tol) =>
        when(col("__ts") - col("__matched") <= tol, col("__matched"))
    }
    unioned
      .withColumn("__matched", last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(lCols.map(col) :+ matched.as("asof_" + rightTs): _*)
  }

  /** Query face: each click event joined to the most recent view event
    * of the same user at or before it. */
  def clickToLastView(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    asofJoin(clicks, views, "user_id", "ts", "vts")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("cts"),
        unix_micros(col("asof_vts")).as("vts"))
      .orderBy("event_id")
  }
}
