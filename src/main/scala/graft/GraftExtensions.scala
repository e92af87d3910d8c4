package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, MinHash32, Shingle3, ShingleN, SimHash64, SrpSig}

/** SparkSessionExtensions entry point: registers the engine's codegen'd
  * expressions as real session functions, so a cluster user gets them
  * with plain configuration instead of per-query registry calls:
  *
  * {{{
  *   spark.sql.extensions = graft.GraftExtensions
  *   SELECT graft_simhash(transform(sh, x -> xxhash64(x))) FROM ...
  * }}}
  *
  * (`VectorFunctions.register` remains for sessions built without the
  * extension, e.g. notebooks attaching to an existing SparkSession.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotProduct(es.head, es(1))),
    "graft_simhash" -> (es => SimHash64(es.head)),
    "graft_shingles" -> (es => Shingle3(es.head)),
    "graft_shingles_n" -> (es => ShingleN(es.head, es(1))),
    "graft_minhash" -> (es => MinHash32(es.head)),
    "graft_srp" -> (es => SrpSig(es.head, es(1))))
}
