package graft.partitioner

import graft.SparkSpec
import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** Distributed hill-scanning (R2, reference S_par_kwayrefine_HS
  * src/kwayrefine.c:1217-1550) in the BSP refinement: pairs of adjacent
  * individually-stuck vertices move together when their combined gain is
  * positive.
  *
  * Fixture (FIXTURES.md style): two clusters joined by a "welded pair" —
  * vertices 0,1 share a heavy internal edge (w=5) and each has a medium
  * edge (w=3) into part B, so every SINGLE move has negative gain
  * (0: 3-6=-3, 1: 3-5=-2; B-side 5: 3-4=-1, 6: 3-6=-3) and the greedy
  * passes are provably stuck at cut 6 — but moving {0,1} jointly to B
  * refunds the shared edge (jgain = 3+3-6-5+2*5 = +5) and drops the cut
  * to w(0,2)=1.
  */
class RefinementHillSpec extends SparkSpec {

  private val edges = Seq(
    (0L, 1L, 5L), // the welded pair
    (0L, 2L, 1L), // pair's residual anchor into A (the final cut)
    (0L, 5L, 3L), (1L, 6L, 3L), // pair -> B attraction
    (2L, 3L, 2L), (3L, 4L, 2L), // A interior
    (5L, 6L, 4L), (6L, 7L, 2L), (7L, 8L, 2L), (8L, 9L, 2L)) // B interior

  private val assign0 = (0L to 4L).map(_ -> 0).toMap ++
    (5L to 9L).map(_ -> 1).toMap

  private def verts = spark.createDataFrame((0L to 9L).map((_, 1L)))
    .toDF("vid", "vwgt")

  test("greedy-only refinement is stuck; hill round moves the welded pair") {
    val e = edgesDf(edges)
    val refined = Refinement.refine(spark, e, verts, assignDf(assign0),
      k = 2, ubFactor = 1.4, passes = 2)
    assert(GraphOps.edgeCut(e, refined) === 1L)
    val parts = refined.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(parts(0L) === 1 && parts(1L) === 1) // the pair moved together
    // balance: 3/7 split is within ubFactor 1.4 (max 7)
    val sizes = refined.groupBy(col("part")).count().collect()
      .map(r => r.getLong(1))
    assert(sizes.max <= 7)
  }

  test("multi-round growth moves a welded QUAD no pair move can unlock") {
    // A path 0-1-2-3 welded by heavy internal edges (6,5,6), each member
    // pulled into B with w=3, anchored to A's interior by w=1 edges at the
    // ends. Singles are all stuck (best gain ≤ -3). Round-1 pairs {0,1} and
    // {2,3} (heaviest-edge handshake) have jgain = 6-18+12 = 0 — still
    // stuck. Only the round-2 merge into the full quad turns profitable:
    //   jgain = 12 - 36 + 2*(6+5+6) = +10
    // and the cut drops from the four pulls (12) to the two anchors (2).
    val quadEdges = Seq(
      (0L, 1L, 6L), (1L, 2L, 5L), (2L, 3L, 6L), // the weld
      (0L, 10L, 3L), (1L, 11L, 3L), (2L, 12L, 3L), (3L, 13L, 3L), // pulls
      (0L, 4L, 1L), (3L, 5L, 1L), // anchors into A (the final cut)
      // A interior (no external edges -> never stuck, never tempted)
      (4L, 5L, 4L), (4L, 6L, 4L), (5L, 7L, 4L), (6L, 8L, 4L), (7L, 9L, 4L),
      // B interior chain
      (10L, 11L, 4L), (11L, 12L, 4L), (12L, 13L, 4L), (13L, 14L, 4L),
      (14L, 15L, 4L), (15L, 16L, 4L), (16L, 17L, 4L), (17L, 18L, 4L),
      (18L, 19L, 4L))
    val a0 = (0L to 9L).map(_ -> 0).toMap ++ (10L to 19L).map(_ -> 1).toMap
    val v20 = spark.createDataFrame((0L to 19L).map((_, 1L)))
      .toDF("vid", "vwgt")
    val e = edgesDf(quadEdges)
    val refined = Refinement.refine(spark, e, v20, assignDf(a0),
      k = 2, ubFactor = 1.7, passes = 2)
    assert(GraphOps.edgeCut(e, refined) === 2L)
    val parts = refined.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L to 3L).foreach(v => assert(parts(v) === 1, s"vid $v stayed"))
    val sizes = refined.groupBy(col("part")).count().collect()
      .map(r => r.getLong(1)).sorted
    assert(sizes.toSeq === Seq(6L, 14L))
  }

  test("hill moves respect the balance floor (pair too heavy is rejected)") {
    // same topology, but tight balance: ub=1.03 forbids a 3/7 split
    val e = edgesDf(edges)
    val refined = Refinement.refine(spark, e, verts, assignDf(assign0),
      k = 2, ubFactor = 1.03, passes = 2)
    // stuck at the initial cut — the profitable hill is infeasible
    assert(GraphOps.edgeCut(e, refined) === 6L)
    val sizes = refined.groupBy(col("part")).count().collect()
      .map(r => r.getLong(1))
    assert(sizes.toSet === Set(5L, 5L))
  }
}
