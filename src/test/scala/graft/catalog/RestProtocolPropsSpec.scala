package graft.catalog

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests pinning the public-Iceberg-REST wire encodings in
  * [[RestProtocol]]: the `%1F`-joined percent-encoded namespace path
  * segments and the error envelope must round-trip ARBITRARY strings
  * (URL metacharacters, control chars, quotes, unicode incl.
  * astral-plane pairs), not just the identifiers the unit tests happen
  * to use — the protocol carries caller-controlled identifiers and
  * messages, so the codec is a correctness surface, not plumbing. Uses
  * ScalaCheck directly (no scalatestplus bridge in the offline cache). */
class RestProtocolPropsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // arbitrary unicode, biased toward the characters that break naive
  // codecs: URL metacharacters, quotes, control chars, non-ASCII.
  // \u001F itself is EXCLUDED from levels — the protocol reserves it as
  // the namespace separator and encNs refuses it (asserted below).
  // Lone surrogates are excluded: they are not encodable in UTF-8, so
  // NO percent-encoding can round-trip them (astral characters are
  // exercised as a proper surrogate PAIR instead).
  private val hostileChar: Gen[Char] = Gen.frequency(
    5 -> Arbitrary.arbitrary[Char],
    2 -> Gen.oneOf('/', '%', '+', '&', '=', '?', '#', ' ', '"', '\\'),
    2 -> Gen.oneOf('\n', '\t', '{', '}', 'é', '中'))
    .map(c => if (c == '\u001F' || Character.isSurrogate(c)) '_' else c)
  private val hostileString: Gen[String] = Gen.frequency(
    9 -> Gen.chooseNum(1, 24)
      .flatMap(n => Gen.listOfN(n, hostileChar).map(_.mkString)),
    1 -> Gen.const("x\ud83d\ude00y")) // astral pair as a unit

  test("namespaces round-trip through encNs → decNs for hostile levels") {
    val nsGen = Gen.chooseNum(1, 4)
      .flatMap(n => Gen.listOfN(n, hostileString))
      .map(ls => Namespace(ls.toVector))
    check(Prop.forAll(nsGen) { ns =>
      RestProtocol.decNs(RestProtocol.encNs(ns)) == ns
    })
  }

  test("encNs output is a single URL path segment (no raw separators survive)") {
    val nsGen = Gen.chooseNum(1, 4)
      .flatMap(n => Gen.listOfN(n, hostileString))
      .map(ls => Namespace(ls.toVector))
    check(Prop.forAll(nsGen) { ns =>
      val seg = RestProtocol.encNs(ns)
      !seg.contains('/') && !seg.contains('?') && !seg.contains('#') &&
        !seg.contains('&') && !seg.exists(_ < 0x20) &&
        // the segment must be parseable inside a URI path
        java.net.URI.create(s"http://h/v1/g/namespaces/$seg").getRawPath
          .endsWith(seg)
    })
  }

  test("a level containing the reserved unit separator is refused, not silently split") {
    intercept[IllegalArgumentException] {
      RestProtocol.encNs(Namespace(Vector("a\u001Fb")))
    }
  }

  test("error envelopes round-trip hostile messages through errorJson → rehydrate") {
    check(Prop.forAll(hostileString) { msg =>
      val json = RestProtocol.errorJson(404, "NoSuchTableException", msg)
      val node = RestProtocol.mapper.readTree(json).get("error")
      val e = RestProtocol.rehydrate(node.get("type").asText,
        node.get("message").asText, node.get("code").asInt)
      e.isInstanceOf[NoSuchTableException] && e.getMessage == msg
    })
  }

  test("every engine error maps to a spec type its own rehydrate inverts") {
    val errs: Seq[Exception] = Seq(
      new AlreadyExistsException("x"), new NoSuchTableException("x"),
      new NoSuchNamespaceException("x"), new IllegalArgumentException("x"))
    errs.foreach { e =>
      val (code, tpe) = RestProtocol.errorFor(e)
      val back = RestProtocol.rehydrate(tpe, "x", code)
      assert(back.getClass == e.getClass, s"$tpe did not invert for ${e.getClass}")
    }
    // foreign/unknown types degrade to RuntimeException with context
    val other = RestProtocol.rehydrate("CommitFailedException", "boom", 409)
    assert(other.isInstanceOf[RuntimeException])
    assert(other.getMessage.contains("CommitFailedException"))
    assert(other.getMessage.contains("boom"))
  }
}
