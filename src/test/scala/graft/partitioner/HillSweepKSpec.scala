package graft.partitioner

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM units for the serial K-WAY hill sweep
  * ([[InitialPartition.hillSweepK]] — the serial mirror of the reference's
  * S_par_kwayrefine_HS, src/kwayrefine.c:1217-1550, used by the
  * [[SerialMultilevel]] tail): same fixtures as the distributed
  * RefinementHillSpec, asserted against the in-array implementation.
  */
class HillSweepKSpec extends AnyFunSuite {

  /** RefinementHillSpec's welded-pair fixture: vertices 0,1 share a heavy
    * internal edge (w=5), each pulled into B with w=3 — every single move
    * has negative gain, the joint move refunds the weld (jgain +5).
    */
  private def weldedPair() = {
    val edges = Array(
      (0L, 1L, 5L),
      (0L, 2L, 1L),
      (0L, 5L, 3L), (1L, 6L, 3L),
      (2L, 3L, 2L), (3L, 4L, 2L),
      (5L, 6L, 4L), (6L, 7L, 2L), (7L, 8L, 2L), (8L, 9L, 2L))
    val verts = (0L to 9L).map(v => (v, 1L)).toArray
    InitialPartition.fromEdges(edges, verts)
  }

  test("hillSweepK moves a welded pair that single-vertex greedy cannot") {
    val g = weldedPair()
    val where = g.vids.map(v => if (v <= 4L) 0 else 1)
    // greedy alone is provably stuck at cut 6
    val greedy = InitialPartition.refineGreedy(g, 2, where.clone(), 1.4)
    assert(InitialPartition.cutOf(g, greedy) === 6L)
    val moved = InitialPartition.hillSweepK(g, 2, where, 1.4)
    assert(moved, "hill sweep must move the welded pair")
    assert(InitialPartition.cutOf(g, where) === 1L)
    assert(where(0) === 1 && where(1) === 1, "the pair moved together")
  }

  test("hillSweepK grows past pairs: welded quad + greedy clean-up") {
    // RefinementHillSpec's quad fixture: path 0-1-2-3 welded (6,5,6), each
    // pulled into B (w=3), anchored into A at the ends (w=1). The sweep
    // freezes as soon as a partial hill turns profitable; the follow-up
    // greedy sweep (the same phase order SerialMultilevel runs) drags the
    // remainder across — final cut = the two anchors.
    val quadEdges = Array(
      (0L, 1L, 6L), (1L, 2L, 5L), (2L, 3L, 6L),
      (0L, 10L, 3L), (1L, 11L, 3L), (2L, 12L, 3L), (3L, 13L, 3L),
      (0L, 4L, 1L), (3L, 5L, 1L),
      (4L, 5L, 4L), (4L, 6L, 4L), (5L, 7L, 4L), (6L, 8L, 4L), (7L, 9L, 4L),
      (10L, 11L, 4L), (11L, 12L, 4L), (12L, 13L, 4L), (13L, 14L, 4L),
      (14L, 15L, 4L), (15L, 16L, 4L), (16L, 17L, 4L), (17L, 18L, 4L),
      (18L, 19L, 4L))
    val verts = (0L to 19L).map(v => (v, 1L)).toArray
    val g = InitialPartition.fromEdges(quadEdges, verts)
    var where = g.vids.map(v => if (v <= 9L) 0 else 1)
    where = InitialPartition.refineGreedy(g, 2, where, 1.7)
    assert(InitialPartition.cutOf(g, where) === 12L, "greedy is stuck")
    if (InitialPartition.hillSweepK(g, 2, where, 1.7))
      where = InitialPartition.refineGreedy(g, 2, where, 1.7)
    assert(InitialPartition.cutOf(g, where) === 2L)
    (0 to 3).foreach(i => assert(where(i) === 1, s"vid $i stayed"))
  }

  test("hillSweepK respects both balance bounds (profitable hill rejected)") {
    val g = weldedPair()
    val where = g.vids.map(v => if (v <= 4L) 0 else 1)
    // ub=1.03 on 10 unit vertices: maxW=6 and minW=4 both forbid 3/7
    val moved = InitialPartition.hillSweepK(g, 2, where, 1.03)
    assert(!moved, "infeasible hill must not move")
    assert(InitialPartition.cutOf(g, where) === 6L)
    assert(where.count(_ == 0) === 5)
  }
}
