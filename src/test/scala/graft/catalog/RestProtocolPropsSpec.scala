package graft.catalog

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests pinning the hand-rolled REST wire codec: whatever
  * [[RestProtocol]] emits, [[RestProtocol.parseFlat]] must read back
  * byte-identically — for ARBITRARY strings (control chars, quotes,
  * backslashes, unicode incl. astral-plane pairs), not just the
  * identifiers the unit tests happen to use. The protocol carries
  * caller-controlled metadata locations, so the codec is a correctness
  * surface, not plumbing. Uses ScalaCheck directly (no scalatestplus
  * bridge in the offline cache). */
class RestProtocolPropsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // arbitrary unicode, biased toward the characters that break naive
  // codecs: quotes, backslashes, control chars, non-ASCII
  private val hostileChar: Gen[Char] = Gen.frequency(
    5 -> Arbitrary.arbitrary[Char],
    2 -> Gen.oneOf('"', '\\', '\n', '\r', '\t', '\b', '\f', '\u0000', '\u001f'),
    2 -> Gen.oneOf('{', '}', '[', ']', ',', ':', 'é', '中', '\ud83d', '\ude00'))
  private val hostileString: Gen[String] = Gen.chooseNum(0, 40)
    .flatMap(n => Gen.listOfN(n, hostileChar).map(_.mkString))

  test("string fields round-trip byte-exact through obj → parseFlat") {
    check(Prop.forAll(hostileString, hostileString, Gen.oneOf(true, false)) {
      (k, v, b) =>
        val json = RestProtocol.obj(
          "k" -> RestProtocol.jstr(k), "v" -> RestProtocol.jstr(v),
          "flag" -> b.toString)
        val parsed = RestProtocol.parseFlat(json)
        parsed("k") == k && parsed("v") == v && parsed("flag") == b
    })
  }

  test("string arrays round-trip element-exact through arr → parseFlat") {
    val listGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, hostileString))
    check(Prop.forAll(listGen) { vs =>
      val json = RestProtocol.obj("items" -> RestProtocol.arr(vs))
      RestProtocol.parseFlat(json)("items") == vs
    })
  }

  test("multi-field objects with hostile keys round-trip") {
    val entryGen = Gen.zip(hostileString, hostileString)
    val mapGen = Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, entryGen))
      .map(_.toMap)
    check(Prop.forAll(mapGen) { m =>
      val json = RestProtocol.obj(
        m.toSeq.map { case (k, v) => k -> RestProtocol.jstr(v) }: _*)
      RestProtocol.parseFlat(json) == m
    })
  }
}
