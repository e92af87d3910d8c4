package graft

import org.apache.spark.sql.GraftExtensionsBridge
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extension injects all graft functions into a session registry") {
    val names = GraftExtensionsBridge.injectedFunctionNames(new GraftExtensions)
    assert(names == Seq("graft_dot", "graft_minhash", "graft_shingles",
      "graft_shingles_n", "graft_simhash", "graft_srp"))
  }

  test("injected builders construct evaluable expressions") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val builder = GraftExtensions.functions.toMap.apply("graft_simhash")
    val e = builder(Seq(Literal(new GenericArrayData(Array(0L)), ArrayType(LongType))))
    assert(e.eval(null) == 0L)
  }
}
