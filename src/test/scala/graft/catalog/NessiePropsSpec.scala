package graft.catalog

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Model-based properties for the commit-log catalog: a random op
  * sequence applied through the [[Catalog]] surface must (a) always
  * agree with a trivial in-memory model, and (b) leave behind a history
  * in which EVERY intermediate hash still replays its exact state at
  * the end — the immutability invariant the whole Nessie design rests
  * on (tags, detached reads, cross-table publish all assume it).
  * Uses ScalaCheck directly (no scalatestplus bridge in the offline
  * cache). */
class NessiePropsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  private final case class Model(namespaces: Set[String], tables: Map[String, String])

  sealed private trait Op
  private case class CreateNs(ns: String) extends Op
  private case class Register(ns: String, tbl: String, loc: String) extends Op
  private case class Drop(ns: String, tbl: String) extends Op

  private val nsNames = Gen.oneOf("a", "b", "a.b", "c")
  private val tblNames = Gen.oneOf("t1", "t2", "t3")
  private val genOp: Gen[Op] = Gen.frequency(
    2 -> nsNames.map(CreateNs),
    4 -> (for { n <- nsNames; t <- tblNames; l <- Gen.alphaLowerStr.map(_.take(6)) }
      yield Register(n, t, s"loc-$l")),
    2 -> (for { n <- nsNames; t <- tblNames } yield Drop(n, t)))

  private def applyModel(m: Model, op: Op): (Model, Boolean) = op match {
    case CreateNs(ns) =>
      // multi-level creates require the parent, mirroring nothing — the
      // catalog itself has no such rule; only existence matters
      if (m.namespaces.contains(ns)) (m, false)
      else (m.copy(namespaces = m.namespaces + ns), true)
    case Register(ns, tbl, loc) =>
      val key = s"$ns.$tbl"
      if (!m.namespaces.contains(ns) || m.tables.contains(key)) (m, false)
      else (m.copy(tables = m.tables + (key -> loc)), true)
    case Drop(ns, tbl) =>
      val key = s"$ns.$tbl"
      if (!m.tables.contains(key)) (m, false)
      else (m.copy(tables = m.tables - key), true)
  }

  private def stateOf(cat: NessieCatalog, m: Model): Unit = {
    val visible = m.namespaces.toSeq.sorted.flatMap { ns =>
      val n = Namespace.parse(ns)
      cat.listTables(n).map(_.toString)
    }.sorted
    assert(visible == m.tables.keys.toSeq.sorted)
    m.tables.foreach { case (k, loc) =>
      assert(cat.loadTableMetadataLocation(TableRef.parse(k)) == loc)
    }
  }

  test("random op sequences agree with the model and every hash replays its state") {
    check(Prop.forAll(Gen.listOfN(25, genOp)) { ops =>
      val dir = Files.createTempDirectory("graft-nessie-prop").toString
      val cat = new NessieCatalog("prop", dir)
      try {
        var model = Model(Set.empty, Map.empty)
        val trail = Vector.newBuilder[(String, Model)]
        ops.foreach { op =>
          val (next, applied) = applyModel(model, op)
          op match {
            case CreateNs(ns) =>
              if (applied) cat.createNamespace(Namespace.parse(ns))
              else intercept[AlreadyExistsException](
                cat.createNamespace(Namespace.parse(ns)))
            case Register(ns, tbl, loc) =>
              val ref = TableRef(Namespace.parse(ns), tbl)
              if (applied) cat.registerTable(ref, loc)
              else intercept[RuntimeException](cat.registerTable(ref, loc))
            case Drop(ns, tbl) =>
              assert(cat.dropTable(TableRef(Namespace.parse(ns), tbl)) == applied)
          }
          model = next
          if (applied) trail += ((cat.currentHash, model))
        }
        stateOf(cat, model)
        // history immutability: every intermediate hash still replays
        // its exact state after everything that came later
        trail.result().foreach { case (hash, m) =>
          val at = new NessieCatalog("replay", dir, ref = hash)
          try stateOf(at, m) finally at.close()
        }
        // and the commit count equals the applied-op count (failed
        // preconditions never commit)
        assert(cat.commitLog().size == trail.result().size)
        true
      } finally cat.close()
    })
  }
}
