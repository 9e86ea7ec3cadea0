package graft.partitioner

import org.apache.spark.sql.functions._
import graft.{Fixtures, SparkSpec}
import graft.operators.GraphOps

/** M3 FC/RC clustering, M4 leaf/twin matching, O2 twin groups, W1 visit
  * order (reference src/aggregate.c — the schemes the fork ships disabled,
  * re-expressed for completeness; see each operator's scaladoc).
  */
class ClusteringSpec extends SparkSpec {

  private def unitVerts(edges: Seq[(Long, Long, Long)]) =
    spark.createDataFrame(Fixtures.vertsOf(edges).map(v => (v, 1L)))
      .toDF("vid", "vwgt")

  test("FC clustering collapses a star into one cluster (M3)") {
    val e = Fixtures.star17
    val cm = Clustering.cmap(edgesDf(e), unitVerts(e), maxVwgt = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // leaves only connect to the hub: everything must land in ONE cluster
    // (rooted wherever the color draws put it — the hub may itself have
    // joined a leaf's cluster first)
    assert(cm.values.toSet.size == 1, s"clusters: ${cm.values.toSet}")
    assert(cm.size == 17)
  }

  test("FC clustering never exceeds the weight cap (M3)") {
    // the star is the worst case: every leaf applies to the same target
    // simultaneously — the admission prefix must keep the cluster <= cap
    val e = Fixtures.star17
    val cm = Clustering.cmap(edgesDf(e), unitVerts(e), maxVwgt = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = cm.values.groupBy(identity).map(_._2.size)
    assert(sizes.max <= 4, s"cluster over cap: $sizes")
    assert(cm.size == 17)
  }

  test("FC round 1 matches the in-JVM oracle: heaviest-connection wins (M3)") {
    // all-singleton round 1: score = ceil(w/sqrt(1)) = edge weight, so each
    // color-0 mover must join its HEAVIEST color-1 neighbor (ties: lower
    // id). Mirror the color hash and recompute the expected map exactly.
    val e = Fixtures.zipf(60).map { case (s, d, w) => (s, d, 1L + (s + d) % 5) }
    val verts = Fixtures.vertsOf(e)
    val seed = 42L
    import org.apache.spark.sql.functions.{xxhash64, lit, col, pmod}
    val colors = spark.createDataFrame(verts.map(Tuple1(_))).toDF("vid")
      .select(col("vid"), pmod(xxhash64(col("vid"), lit(seed + 1)), lit(2))
        .as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nbrs = (e.map(t => (t._1, (t._2, t._3))) ++
      e.map(t => (t._2, (t._1, t._3))))
      .groupBy(_._1).map { case (v, g) => v -> g.map(_._2) }
    val expected = verts.map { v =>
      val targets =
        if (colors(v) == 1) Seq.empty
        else nbrs.getOrElse(v, Seq.empty).filter(n => colors(n._1) == 1)
      if (targets.isEmpty) v -> v
      else {
        // rank: (score=w, -twgt=-1, -id) max — i.e. max w, ties lower id
        val best = targets.maxBy { case (id, w) => (w, -id) }
        v -> best._1
      }
    }.toMap
    val cm = Clustering.cmap(edgesDf(e), unitVerts(e), maxVwgt = 1000L,
      rounds = 1, seed = seed)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cm == expected)
  }

  test("RC clustering is deterministic and total (M3)") {
    val e = Fixtures.zipf(100)
    val run1 = Clustering.cmap(edgesDf(e), unitVerts(e), 50L,
      scheme = Clustering.RC).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val run2 = Clustering.cmap(edgesDf(e), unitVerts(e), 50L,
      scheme = Clustering.RC).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run1 == run2)
    assert(run1.keySet == Fixtures.vertsOf(e).toSet)
    // cluster labels are roots: label(root) == root
    run1.values.toSet.foreach((c: Long) => assert(run1(c) == c,
      s"non-root cluster label $c -> ${run1(c)}"))
  }

  test("FC labels are roots, caps hold, graph shrinks (M3)") {
    val e = Fixtures.zipf(200)
    val cm = Clustering.cmap(edgesDf(e), unitVerts(e), 30L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cm.values.toSet.foreach((c: Long) => assert(cm(c) == c))
    val sizes = cm.values.groupBy(identity).map(_._2.size)
    assert(sizes.max <= 30)
    // contraction-ready: strictly fewer clusters than vertices
    assert(cm.values.toSet.size < cm.size)
  }

  test("leaf matching pairs leaves sharing a parent, floor(n/2) per parent (M4)") {
    // parent 0 with 5 leaves, parent 10 with 2 leaves, plus a 2-cycle
    val e = Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L), (0L, 4L, 1L),
      (0L, 5L, 1L), (10L, 11L, 1L), (10L, 12L, 1L), (10L, 20L, 1L),
      (20L, 21L, 1L), (21L, 10L, 1L))
    val pairs = Matching.matchLeaves(edgesDf(e), unitVerts(e), 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // leaves of 0: {1,2,3,4,5} -> 2 pairs (1,2),(3,4); leaves of 10: {11,12}
    assert(pairs == Set((1L, 2L), (3L, 4L), (11L, 12L)))
  }

  test("leaf matching honors the weight cap (M4)") {
    val e = Seq((0L, 1L, 1L), (0L, 2L, 1L))
    val heavy = spark.createDataFrame(Seq((0L, 1L), (1L, 5L), (2L, 5L)))
      .toDF("vid", "vwgt")
    assert(Matching.matchLeaves(edgesDf(e), heavy, maxVwgt = 9L).count() == 0)
    assert(Matching.matchLeaves(edgesDf(e), heavy, maxVwgt = 10L).count() == 1)
  }

  test("twin matching pairs identical-adjacency vertices (M4/O2)") {
    // 1,2,3 all adjacent to exactly {0, 9}: three twins -> one pair (1,2)
    val e = Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L),
      (1L, 9L, 1L), (2L, 9L, 1L), (3L, 9L, 1L), (0L, 9L, 2L))
    val pairs = Matching.matchTwins(edgesDf(e), unitVerts(e), 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("twinGroups finds the twin classes (O2)") {
    val e = Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L),
      (1L, 9L, 1L), (2L, 9L, 1L), (3L, 9L, 1L), (0L, 9L, 2L))
    val g = GraphOps.twinGroups(edgesDf(e)).collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("n_twins") == 3L)
    assert(g(0).getAs[Long]("min_vid") == 1L)
  }

  test("2-hop augmentation unsticks a stalled star matching (M5+M4)") {
    // SHEM on a star pairs the hub with ONE leaf; the rest self-match
    // (leaves share no edge). augment2Hop must pair them via the parent.
    val e = Fixtures.star17
    val verts = spark.createDataFrame(
      Fixtures.vertsOf(e).map(v => (v, Array(1L)))).toDF("vid", "vwgts")
    val cmap0 = Matching.cmapMC(edgesDf(e), verts, Array(100L))
    val self0 = cmap0.filter(col("vid") === col("coarse")).count()
    assert(self0 >= 14, s"star should stall SHEM, self-matched = $self0")
    val cmap1 = Matching.augment2Hop(edgesDf(e), verts, cmap0, 100L)
    val m = cmap1.collect().map(r => (r.getLong(0), r.getLong(1)))
    // still a matching: every coarse id has <= 2 members
    val sizes = m.groupBy(_._2).map(_._2.length)
    assert(sizes.max <= 2)
    // nearly everything pairs: at most 1 leftover (odd count) + hub pair
    val self1 = m.count { case (v, c) => v == c && !m.exists(t =>
      t._1 != v && t._2 == c) }
    assert(self1 <= 2, s"2-hop left $self1 unmatched on a star")
  }

  test("FC-only coarsening converges on a star without 2-hop (M3 in M5)") {
    // the dispatch's last resort: a star must coarsen to near-a-point
    // through clustering ALONE — no SHEM pairs (leaves share no edge),
    // no 2-hop augmentation consulted
    var e = edgesDf(Fixtures.star17)
    var v = spark.createDataFrame(
      Fixtures.vertsOf(Fixtures.star17).map(vv => (vv, Array(1L))))
      .toDF("vid", "vwgts")
    var n = 17L
    var rounds = 0
    while (n > 2 && rounds < 5) {
      val cm = Clustering.cmap(e,
        v.select(col("vid"), element_at(col("vwgts"), 1).as("vwgt")),
        maxVwgt = 100L)
      val (ce, cv) = Contraction.contractMC(e, v, cm, 1)
      e = graft.plans.Plans.checkpoint(ce)
      v = graft.plans.Plans.checkpoint(cv)
      val n2 = v.count()
      assert(n2 < n, s"clustering failed to shrink the star at n=$n")
      n = n2
      rounds += 1
    }
    assert(n <= 2, s"star did not converge under FC-only coarsening: n=$n")
    // weight conserved end-to-end
    val tw = v.select(element_at(col("vwgts"), 1)).collect().map(_.getLong(0)).sum
    assert(tw == 17L)
  }

  test("augment2Hop leaves matched-pair roots alone (hub vid > leaf vid)") {
    // Inverted star: hub is vid 16, leaves 0..15. cmapMC emits (u,u),(v,u)
    // for pair u<v, so the hub's matched LEAF partner satisfies
    // vid === coarse; a vid===coarse selfie filter would re-point that
    // leaf at a 2-hop twin while the hub still points at it — a 3-member
    // coarse group. The group-size-1 selfie definition must not.
    val e = (0L to 15L).map(l => (16L, l, 1L))
    val verts = spark.createDataFrame(
      Fixtures.vertsOf(e).map(v => (v, Array(1L)))).toDF("vid", "vwgts")
    val cmap0 = Matching.cmapMC(edgesDf(e), verts, Array(100L))
    val matched0 = cmap0.collect().map(r => (r.getLong(0), r.getLong(1)))
    // precondition for the regression: some pair root is a leaf
    assert(matched0.groupBy(_._2).exists(_._2.length == 2))
    val cmap1 = Matching.augment2Hop(edgesDf(e), verts, cmap0, 2L)
    val m = cmap1.collect().map(r => (r.getLong(0), r.getLong(1)))
    val sizes = m.groupBy(_._2).map(_._2.length)
    assert(sizes.max <= 2, s"coarse group exceeded pair size: $sizes")
    // matched pairs from cmap0 survive intact
    for ((c, mem) <- matched0.groupBy(_._2) if mem.length == 2)
      assert(m.count(_._2 == c) == 2, s"pair at coarse $c was broken")
  }

  test("visitOrder ranks by capped degree ascending (W1)") {
    val e = Fixtures.star17 // hub deg 16, leaves deg 1, avg 2 -> cap 2
    val vo = GraphOps.visitOrder(edgesDf(e)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(vo(0L)._1 == 2L) // hub capped to floor(0.7*avg)+1
    assert(vo(0L)._2 == 17L) // highest capped degree visits LAST
    assert((1L to 16L).map(v => vo(v)._1).toSet == Set(1L))
    assert(vo.values.map(_._2).toSeq.sorted == (1L to 17L))
  }
}
