package graft.partitioner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GraphOps
import graft.plans.Plans.CheckpointOps

/** Vertex-separator FM refinement — the serial re-expression of the
  * reference's separator-refinement family (par_vseprefine,
  * reference src/vseprefine.c:2380-2534; FM core :1384-1810): after the
  * greedy edge-cover builds a VALID separator, FM moves shrink it.
  *
  * Move semantics (3-way labels A=0/B=1/SEP=2, reference vseprefine.c FM):
  * a separator vertex v may move to side s; every neighbor of v on the
  * OPPOSITE side is pulled INTO the separator (otherwise an A–B edge would
  * escape). Gain = w(v) − Σ w(pulled). Moves are applied greedily
  * (negative gains allowed, FM-style) with rollback to the best separator
  * weight seen; pulled vertices are locked for the pass (they have no
  * gathered adjacency, so they never move back out — conservative).
  *
  * Distribution shape (J8, the boundary-gather pattern of
  * par_graph_extract_separator, reference src/graph.h:566-603): only the
  * separator and its frontier N(SEP) are gathered — bounded by
  * `maxGather` — while side weights count the WHOLE graph via one
  * aggregate, so balance is global. The rest of the graph never moves.
  */
object SeparatorRefine {

  /** Refine `where(vid, side)` (side ∈ {0,1,2}); returns the same schema.
    * `vwgt(vid, vwgt)` supplies vertex weights. Falls back to the input
    * unchanged when the separator is empty or the gather exceeds
    * `maxGather`.
    */
  def refine(spark: SparkSession, edges: DataFrame, where: DataFrame,
             vwgt: DataFrame, ubFactor: Double = 1.2,
             maxGather: Long = 200000L, passes: Int = 4): DataFrame = {
    val w = where.select(col("vid"), col("side")).ckpt()
    val sepV = w.filter(col("side") === 2).select(col("vid"))
    if (sepV.isEmpty) return w
    // adjacency of separator vertices (both directions), dst side/weight
    val sym = GraphOps.symmetrize(edges)
    val sepAdj = sym.join(sepV.withColumnRenamed("vid", "src"), Seq("src"),
        "left_semi")
      .select(col("src"), col("dst"))
    val gatherIds = sepV.unionByName(sepAdj.select(col("dst").as("vid")))
      .distinct()
    val nGather = gatherIds.count()
    if (nGather > maxGather) {
      // never silent (repo rule): a skipped refinement is a quality loss
      // the caller must be able to see and count
      graft.plans.Metrics.event("vsep_refine_skipped",
        s"separator+frontier $nGather > maxGather $maxGather — " +
          "returning input unrefined")
      return w
    }
    // global side weights (balance is whole-graph, not gathered-set)
    val sideWRows = w.join(vwgt, "vid").groupBy(col("side"))
      .agg(sum(col("vwgt")).as("sw")).collect()
    val sideW = Array.fill(3)(0L)
    sideWRows.foreach(r => sideW(r.get(0).toString.toInt) = r.getLong(1))
    val gathered = gatherIds.join(w, "vid").join(vwgt, "vid")
      .select(col("vid"), col("side"), col("vwgt")).collect()
      .map(r => (r.getLong(0), r.get(1).toString.toInt, r.getLong(2)))
      .sortBy(_._1)
    val ids = gathered.map(_._1)
    val idx = ids.zipWithIndex.toMap
    val side = gathered.map(_._2)
    val vw = gathered.map(_._3)
    val adjPairs = sepAdj.collect()
      .map(r => (idx(r.getLong(0)), idx(r.getLong(1))))
    val adj = Array.fill(ids.length)(Array.empty[Int])
    adjPairs.groupBy(_._1).foreach { case (v, ps) =>
      adj(v) = ps.map(_._2).distinct.sorted
    }
    val changed = fm(side, vw, adj, sideW, ubFactor, passes)
    if (!changed) return w
    val updated = spark.createDataFrame(
        ids.toIndexedSeq.zipWithIndex.map { case (v, i) => (v, side(i)) })
      .toDF("vid", "nside")
    w.join(updated, Seq("vid"), "left")
      .select(col("vid"),
        coalesce(col("nside"), col("side")).cast("int").as("side"))
  }

  /** In-place FM over the gathered arrays; returns true if any label
    * changed. `adj` is populated only for initial separator members.
    */
  private[partitioner] def fm(side: Array[Int], vw: Array[Long],
                              adj: Array[Array[Int]], sideW: Array[Long],
                              ubFactor: Double, passes: Int): Boolean = {
    val n = side.length
    val tv = sideW.sum
    val maxSide = math.ceil(ubFactor * tv / 2.0).toLong
    val orig = side.clone()
    var bestSide = side.clone()
    var bestSepW = sideW(2)
    val bestW = sideW.clone()
    var pass = 0
    var improvedAny = true
    while (pass < passes && improvedAny) {
      improvedAny = false
      val locked = new Array[Boolean](n)
      val sepSize0 = (0 until n).count(side(_) == 2)
      var moves = 0
      var more = true
      while (more && moves < 2 * sepSize0 + 4) {
        // best (v ∈ SEP with adjacency, unlocked) → s move by gain
        var bv = -1; var bs = -1; var bGain = Long.MinValue
        var v = 0
        while (v < n) {
          if (side(v) == 2 && !locked(v) && adj(v).nonEmpty) {
            var s = 0
            while (s < 2) {
              // balance: target side may not overfill (or must stay the
              // lighter side, so a skewed start can still drain)
              if (sideW(s) + vw(v) <= maxSide ||
                  sideW(s) + vw(v) <= sideW(1 - s)) {
                var pull = 0L
                adj(v).foreach(u => if (side(u) == 1 - s) pull += vw(u))
                val gain = vw(v) - pull
                if (gain > bGain ||
                    (gain == bGain && bv >= 0 &&
                      sideW(s) < sideW(bs))) {
                  bv = v; bs = s; bGain = gain
                }
              }
              s += 1
            }
          }
          v += 1
        }
        if (bv < 0) more = false
        else {
          side(bv) = bs; locked(bv) = true
          sideW(2) -= vw(bv); sideW(bs) += vw(bv)
          adj(bv).foreach { u =>
            if (side(u) == 1 - bs) {
              sideW(side(u)) -= vw(u)
              side(u) = 2; sideW(2) += vw(u)
              locked(u) = true
            }
          }
          moves += 1
          if (sideW(2) < bestSepW) {
            bestSepW = sideW(2)
            Array.copy(side, 0, bestSide, 0, n)
            Array.copy(sideW, 0, bestW, 0, 3)
            improvedAny = true
          }
        }
      }
      // rollback to the best state seen (FM)
      Array.copy(bestSide, 0, side, 0, n)
      Array.copy(bestW, 0, sideW, 0, 3)
      pass += 1
    }
    !side.sameElements(orig)
  }
}
