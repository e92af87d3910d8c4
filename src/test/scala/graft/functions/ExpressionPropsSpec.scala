package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests pinning the codegen'd expressions to naive reference
  * implementations of the HOF formulations they replaced — random-input
  * equivalence, beyond the corpus the oracle gate exercises. Uses
  * ScalaCheck directly (no scalatestplus bridge in the offline cache).
  */
class ExpressionPropsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val tokenGen: Gen[String] = Gen.chooseNum(0, 30).flatMap(n =>
    Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val tokensGen: Gen[List[String]] = Gen.chooseNum(0, 40).flatMap(n =>
    Gen.listOfN(n, tokenGen))
  private val hashesGen: Gen[List[Long]] = Gen.chooseNum(0, 60).flatMap(n =>
    Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue)))

  test("Shingle3.compute == sliding(3).map(mkString).distinct") {
    check(Prop.forAll(tokensGen) { toks =>
      val got = {
        val arr = new GenericArrayData(
          toks.map(t => UTF8String.fromString(t): Any).toArray)
        val out = Shingle3.compute(arr)
        (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
      }
      val want =
        if (toks.size < 3) Seq.empty[String]
        else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      got == want
    })
  }

  test("ShingleN.compute == sliding(n).map(mkString).distinct for n in 1..8") {
    check(Prop.forAll(tokensGen, Gen.chooseNum(1, 8)) { (toks, n) =>
      val got = {
        val arr = new GenericArrayData(
          toks.map(t => UTF8String.fromString(t): Any).toArray)
        val out = ShingleN.compute(arr, n)
        (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
      }
      val want =
        if (toks.size < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      got == want
    })
  }

  test("SimHash64 == per-bit +1/-1 majority vote") {
    val e = SimHash64(null)
    check(Prop.forAll(hashesGen) { hs =>
      val got = e.nullSafeEval(new GenericArrayData(hs.toArray)).asInstanceOf[Long]
      val want = (0 until 64).foldLeft(0L) { (acc, i) =>
        val c = hs.map(h => if (((h >>> i) & 1L) == 1L) 1 else -1).sum
        if (c > 0) acc | (1L << i) else acc
      }
      got == want
    })
  }

  test("MinHash32.compute == min over pmod affine permutations") {
    check(Prop.forAll(hashesGen) { hs =>
      val out = MinHash32.compute(new GenericArrayData(hs.toArray))
      val got = (0 until 32).map(j =>
        if (out.isNullAt(j)) None else Some(out.getLong(j)))
      val P = MinHash32.P
      val want = (0 until 32).map { j =>
        if (hs.isEmpty) None
        else Some(hs.map { h =>
          val hm = ((h % P) + P) % P
          (hm * MinHash32.permA(j) + MinHash32.permB(j)) % P
        }.min)
      }
      got == want
    })
  }

  test("DotProduct == zipped multiply-sum over the common prefix") {
    val e = DotProduct(null, null)
    val vecGen = Gen.chooseNum(0, 32).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1e3, 1e3)))
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val got = e.nullSafeEval(
        new GenericArrayData(a.toArray),
        new GenericArrayData(b.toArray)).asInstanceOf[Double]
      val want = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      got == want
    })
  }

  test("WeightedAvg: zero total weight yields NaN instead of throwing") {
    val agg = new WeightedAvg
    // all-zero weights and an exactly-cancelling mix both leave den = 0
    val b1 = agg.reduce(agg.reduce(agg.zero, (5.0, 0.0)), (7.0, 0.0))
    assert(agg.finish(b1).isNaN)
    val b2 = agg.reduce(agg.reduce(agg.zero, (5.0, 2.0)), (7.0, -2.0))
    assert(agg.finish(b2).isNaN)
    assert(agg.finish(agg.zero).isNaN)
    // and a normal group is unaffected
    assert(agg.finish(agg.reduce(agg.zero, (5.0, 2.0))) == 5.0)
  }

  test("SrpSig: bit j == sign of dot(v, Rademacher plane j); packed layout") {
    val vGen = Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0)))
    check(Prop.forAll(vGen) { v =>
      val arr = new GenericArrayData(v.toArray)
      val words = SrpSig.compute(arr, 128)
      (0 until 128).forall { j =>
        val bit = (words.getLong(j / 64) >>> (j % 64)) & 1L
        // recompute the plane the same deterministic way
        val dot = v.zipWithIndex.map { case (x, d) =>
          x * (if (SrpSig.planeSign(j, d)) 1.0 else -1.0)
        }.sum
        bit == (if (dot > 0) 1L else 0L)
      }
    })
  }

  test("TableRef.parse is the inverse of toString for dotless levels") {
    import graft.catalog.{Namespace, TableRef}
    val level = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val refGen = for {
      ns <- Gen.chooseNum(0, 4).flatMap(n => Gen.listOfN(n, level))
      name <- level
    } yield TableRef(Namespace(ns.toVector), name)
    check(Prop.forAll(refGen)(r => TableRef.parse(r.toString) == r))
  }
}
