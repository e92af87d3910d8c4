package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (SURVEY §2B E23).
  *
  * [[WeightedAvg]] computes a weighted mean with EXACT decimal partial
  * sums — each term is rounded to 4dp once (matching Spark's
  * `CAST(x AS DECIMAL(38,4))` HALF_UP semantics) and then summed in
  * BigDecimal, so partial aggregation and merge order cannot perturb the
  * result; only the final division happens in IEEE doubles. This is the
  * same shuffle-order-proof recipe as the engine's dsum/davg columns,
  * expressed through the UDAF API instead of built-in expressions.
  */
final case class WAvgBuf(num: JBigDecimal, den: JBigDecimal)

class WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {

  private def dec4(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(4, RoundingMode.HALF_UP)

  override def zero: WAvgBuf = WAvgBuf(JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: WAvgBuf, in: (Double, Double)): WAvgBuf = {
    val (x, w) = in
    WAvgBuf(b.num.add(dec4(x * w)), b.den.add(dec4(w)))
  }

  override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
    WAvgBuf(a.num.add(b.num), a.den.add(b.den))

  override def finish(b: WAvgBuf): Double = {
    // zero total weight has no defined mean — return NaN rather than let
    // BigDecimal.valueOf(±Inf/NaN) throw and fail the whole query; the
    // same applies when a double-range-exceeding sum divides to ±Inf/NaN
    if (b.den.signum == 0) return Double.NaN
    val raw = b.num.doubleValue() / b.den.doubleValue()
    if (raw.isNaN || raw.isInfinite) raw
    else JBigDecimal.valueOf(raw).setScale(4, RoundingMode.HALF_UP).doubleValue()
  }

  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
