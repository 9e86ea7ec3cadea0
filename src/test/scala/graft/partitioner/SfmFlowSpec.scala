package graft.partitioner

import org.scalatest.funsuite.AnyFunSuite

/** Direct unit tests for the SFM flow kernel's rollback semantics
  * (reference S_flow_SFM, src/vseprefine.c:853-868 limit window and
  * :1000-1026 move-ordered rollback) — pure JVM, no Spark session.
  */
class SfmFlowSpec extends AnyFunSuite {

  test("sfmFlow: non-improving window rolls back to the best prefix") {
    // path 0-1-2-3-4, A={0}, SEP={1}, B={2,3,4}, unit weights, target A.
    // Move 1: 1→A pulls 2 (sep weight unchanged, balance 2/2 — improved
    // via the balance tiebreak). Move 2: 2→A pulls 3 (no improvement);
    // with limit=0 the window trips immediately and the pass must roll
    // back move 2 in reverse order: 2 back to SEP, 3 back to B.
    val side = Array(0, 2, 1, 1, 1)
    val vw = Array(1L, 1L, 1L, 1L, 1L)
    val adj = Array(Array(1), Array(0, 2), Array(1, 3), Array(2, 4),
      Array(3))
    val canMove = Array.fill(5)(true)
    val sideW = Array(1L, 3L, 1L)
    val retained = SeparatorRefine.sfmFlow(side, vw, adj, canMove, sideW,
      s = 0, maxSide = 10L, limit = 0)
    assert(retained == 1, s"exactly the improving move is retained")
    assert(side.toSeq == Seq(0, 0, 2, 1, 1),
      s"rollback must restore 2→SEP and 3→B: ${side.toSeq}")
    assert(sideW.toSeq == Seq(2L, 2L, 1L),
      s"side weights must match the rolled-back state: ${sideW.toSeq}")
  }

  test("sfmFlow: pulled vertices re-enter the queue and flow onward") {
    // same path, generous limit: the flow walks the corridor toward A
    // (1→A pulling 2, then 2→A pulling 3) until maxSide=3 stops it; the
    // rollback keeps the best prefix — the balanced 2/2 state with
    // vertex 2 as the separator. Pull-and-lock FM cannot reach it (its
    // one move never shrinks the separator, so it fully rolls back).
    val side = Array(0, 2, 1, 1, 1)
    val vw = Array(1L, 1L, 1L, 1L, 1L)
    val adj = Array(Array(1), Array(0, 2), Array(1, 3), Array(2, 4),
      Array(3))
    val canMove = Array.fill(5)(true)
    val sideW = Array(1L, 3L, 1L)
    val retained = SeparatorRefine.sfmFlow(side, vw, adj, canMove, sideW,
      s = 0, maxSide = 3L, limit = 16)
    assert(retained == 1, s"the balanced prefix is one move: $retained")
    assert(side.toSeq == Seq(0, 0, 2, 1, 1),
      s"flow must shift the separator from 1 to 2: ${side.toSeq}")
    assert(sideW.toSeq == Seq(2L, 2L, 1L), sideW.toSeq.toString)
    // separator validity: no A-B edge on the path
    val pairs = Seq((0, 1), (1, 2), (2, 3), (3, 4))
    val bad = pairs.filter { case (a, b) =>
      (side(a) == 0 && side(b) == 1) || (side(a) == 1 && side(b) == 0) }
    assert(bad.isEmpty, s"uncovered A-B edges: $bad in ${side.toSeq}")
  }

  test("sfmFlow: !canMove ring vertices are pulled but never moved") {
    // star: hub 1 in SEP, leaf 0 in A, leaves 2,3 in B with 3 NOT movable
    // (gathered without adjacency). Moving 1→A pulls both 2 and 3 into
    // the separator; 3 must stay there even though its gain would be
    // positive, because its adjacency is incomplete.
    val side = Array(0, 2, 1, 1)
    val vw = Array(1L, 1L, 1L, 1L)
    val adj = Array(Array(1), Array(0, 2, 3), Array(1), Array(1))
    val canMove = Array(true, true, true, false)
    val sideW = Array(1L, 2L, 1L)
    val retained = SeparatorRefine.sfmFlow(side, vw, adj, canMove, sideW,
      s = 0, maxSide = 10L, limit = 16)
    // no state both drains the separator and balances here, so the whole
    // flow rolls back (the hub's gain is negative and pulling 2+3 only
    // grows the separator) — but regardless of the rollback point, the
    // immovable vertex must never land in a half
    assert(side(3) != 0, s"immovable vertex moved to A: ${side.toSeq}")
    assert(retained == 0 && side.toSeq == Seq(0, 2, 1, 1),
      s"this fixture has no improving prefix — full rollback: ${side.toSeq}")
  }
}
