package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps
import graft.partitioner.{Contraction, InitialPartition, Matching, Multilevel, Refinement}

/** Multilevel-partitioner invariants mirroring the reference's assertion
  * suite: mutual matching / cluster size <= 2 (reference src/aggregate.c:
  * 354-388), weight conservation under contraction (src/check.c:303-414),
  * balance within ubfactor (src/ctrl.c:40), cut non-increase under
  * refinement, and end-to-end quality vs the serial oracle (best-of-8
  * greedy growing + refinement — the same scheme as the reference's
  * initial-partition stage P10).
  */
class PartitionerSpec extends SparkSpec {

  private def unitVerts(vids: Seq[Long]) =
    spark.createDataFrame(vids.map(v => (v, 1L))).toDF("vid", "vwgt")

  test("matching: every vertex mapped once, clusters <= 2, pairs are edges") {
    val e = Fixtures.zipf(200)
    val vids = Fixtures.vertsOf(e)
    val cmap = Matching.cmap(edgesDf(e), unitVerts(vids), maxVwgt = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cmap.keySet == vids.toSet, "every vertex mapped exactly once")
    val clusters = cmap.groupBy(_._2).map(_._2.size)
    assert(clusters.max <= 2, "a coarse vertex merges at most 2 fine vertices")
    // matched pairs (non-self clusters) must be actual edges
    val edgeSet = e.map(t => (t._1, t._2)).toSet
    val pairs = cmap.groupBy(_._2).values.filter(_.size == 2)
      .map(g => { val s = g.keys.toSeq.sorted; (s(0), s(1)) })
    assert(pairs.forall(edgeSet.contains), "matches cross real edges only")
    // coarse id = min of cluster (cmap convention)
    assert(cmap.groupBy(_._2).forall { case (c, g) => g.keys.min == c })
  }

  test("matching respects the vertex-weight cap (P7)") {
    // path of 4 with one huge vertex: 1 may not match 2 (weight 60+60 > 100)
    val e = Seq((0L, 1L, 1L), (1L, 2L, 5L), (2L, 3L, 1L))
    val vw = spark.createDataFrame(
      Seq((0L, 1L), (1L, 60L), (2L, 60L), (3L, 1L))).toDF("vid", "vwgt")
    val cmap = Matching.cmap(edgesDf(e), vw, maxVwgt = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cmap(1L) != cmap(2L), "over-cap pair must not merge")
  }

  test("contraction conserves weights and drops only internal edges (A1)") {
    val e = Fixtures.zipf(150)
    val vids = Fixtures.vertsOf(e)
    val cmapDf = Matching.cmap(edgesDf(e), unitVerts(vids), maxVwgt = 100L)
    val (ce, cv) = Contraction.contract(edgesDf(e), unitVerts(vids), cmapDf)
    val cmap = cmapDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fineTotal = e.map(_._3).sum
    val internal = e.filter(t => cmap(t._1) == cmap(t._2)).map(_._3).sum
    val coarseTotal = ce.agg(coalesce(sum(col("wgt")), lit(0L))).head().getLong(0)
    assert(coarseTotal == fineTotal - internal,
      "edge weight conserved minus intra-cluster edges")
    val coarseVwgt = cv.agg(sum(col("vwgt"))).head().getLong(0)
    assert(coarseVwgt == vids.size.toLong, "vertex weight conserved")
    assert(ce.filter(col("src") >= col("dst")).count() == 0, "canonical + no loops")
    // parallel edges merged: (src,dst) unique
    assert(ce.groupBy(col("src"), col("dst")).count()
      .filter(col("count") > 1).count() == 0)
  }

  test("serial initial partition: K5-K5 bridge found, balance respected") {
    val e = Fixtures.twoCliques
    val vids = Fixtures.vertsOf(e)
    val g = InitialPartition.fromEdges(e.toArray, vids.map((_, 1L)).toArray)
    val where = InitialPartition.partition(g, k = 2, ubFactor = 1.03)
    assert(InitialPartition.cutOf(g, where) == 1L, "mincut = the bridge")
    val sizes = where.groupBy(identity).map(_._2.size)
    assert(sizes.toSet == Set(5), "perfect 5/5 balance")
  }

  test("distributed refinement only improves the cut and keeps balance") {
    val e = Fixtures.grid4x4
    val vids = Fixtures.vertsOf(e)
    val vw = unitVerts(vids)
    // deliberately bad but balanced start: odd/even interleave, cut = 18
    val bad = assignDf(vids.map(v => v -> (v % 2).toInt).toMap)
    val cut0 = GraphOps.edgeCut(edgesDf(e), bad)
    val refined = Refinement.refine(spark, edgesDf(e), vw, bad, k = 2)
    val cut1 = GraphOps.edgeCut(edgesDf(e), refined)
    assert(cut1 <= cut0, s"refinement must not worsen the cut ($cut0 -> $cut1)")
    assert(GraphOps.imbalance(refined, vw, 2) <= 1.03 + 2.0 / 16 + 1e-9)
    assert(refined.count() == 16, "assignment stays total")
  }

  test("multilevel end-to-end: quality vs serial oracle, balance, determinism") {
    val e = Fixtures.zipf(300)
    val vids = Fixtures.vertsOf(e)
    val vw = unitVerts(vids)
    val k = 4
    val r = Multilevel.partition(spark, edgesDf(e), vw, k, coarsenTo0 = 60)
    assert(r.levels >= 1, "graph of 300 must coarsen at least one level")
    // total assignment, parts in range
    val parts = r.assign.collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(parts.keySet == vids.toSet)
    assert(parts.values.forall(p => p >= 0 && p < k))
    // balance within ubfactor + integrality allowance
    assert(r.imbalance <= 1.03 + 2.0 * k / vids.size + 1e-9,
      s"imbalance ${r.imbalance}")
    // quality: within 1.5x of the serial oracle on the same graph
    val g = InitialPartition.fromEdges(e.toArray, vids.map((_, 1L)).toArray)
    val oracleCut = InitialPartition.cutOf(g,
      InitialPartition.partition(g, k, 1.03))
    assert(r.cut <= math.max(oracleCut * 3 / 2, oracleCut + 5),
      s"cut ${r.cut} too far above serial oracle $oracleCut")
    // determinism: same seed -> identical assignment
    val r2 = Multilevel.partition(spark, edgesDf(e), vw, k, coarsenTo0 = 60)
    val parts2 = r2.assign.collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(parts == parts2, "same seed must reproduce the assignment")
  }

  test("multilevel on the bridge graph finds the unit cut") {
    val e = Fixtures.twoCliques
    val vw = unitVerts(Fixtures.vertsOf(e))
    val r = Multilevel.partition(spark, edgesDf(e), vw, 2)
    assert(r.cut == 1L, s"expected the bridge cut, got ${r.cut}")
    assert(math.abs(r.imbalance - 1.0) < 1e-9)
  }
}
