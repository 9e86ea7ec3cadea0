package graft.partitioner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.GraphOps

/** Bulk-synchronous greedy boundary refinement — the Spark re-expression of
  * the reference's chunked greedy k-way refinement
  * (par_kwayrefine_chunk, reference src/kwayrefine_chunk.c:471-843).
  *
  * Per pass (≤ `passes`, reference nrefpass=8 src/ctrl.c:39):
  *   1. J5 neighbor-partition join (S_partparams_kway src/refine.c:39-211):
  *      per (vertex, neighbor part) summed edge weight → internal degree
  *      `id`, external degrees `ed(p)`;
  *   2. boundary predicate `ed ≥ id` (reference is_bnd, src/base.h:512-522);
  *   3. candidate move per boundary vertex: max-gain target part
  *      (gain = ed(p) − id > 0);
  *   4. anti-oscillation: the reference's two-phase S_right_side rule
  *      (kwayrefine.c:142-167 — phase 0 moves only to higher pids, phase 1
  *      only lower) applied verbatim to suppress A↔B swap thrash;
  *   5. balance feasibility: per target part, accept candidates in
  *      gain-descending order while the part stays under
  *      maxwgt = tvwgt/k · ubFactor (R5, kwayrefine.c:1056-1059) given its
  *      pass-start weight plus admitted inflow minus certain outflow is a
  *      conservative bound — enforced with a cumulative-weight window;
  *   6. pwgts re-synced from scratch per pass (S_par_sync_pwgts,
  *      kwayrefine.c:774-807) — consistent by construction in BSP;
  *   7. keep the best assignment seen (mincut tracking, kwayrefine.c:1186).
  */
object Refinement {

  def refine(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
             assign0: DataFrame, k: Int, ubFactor: Double = 1.03,
             passes: Int = 8): DataFrame = {
    val sym = GraphOps.symmetrize(edges).persist()
    val vw = vertices.select(col("vid"), col("vwgt")).persist()
    val tvwgt = vw.agg(sum(col("vwgt"))).head().getLong(0)
    val maxW = math.ceil(tvwgt.toDouble / k * ubFactor).toLong

    var best = assign0.select(col("vid"), col("part")).localCheckpoint(true)
    var bestCut = GraphOps.edgeCut(edges, best)
    var cur = best
    var pass = 0
    var improved = true
    while (pass < passes && improved) {
      // two phases per pass, reference S_right_side parity rule
      for (phase <- 0 to 1) {
        val a = cur
        // 1. neighbor-partition aggregation (J5)
        val nbr = sym
          .join(a.select(col("vid").as("dst"), col("part").as("dpart")), "dst")
          .groupBy(col("src").as("vid"), col("dpart"))
          .agg(sum(col("wgt")).as("conn"))
        val withHome = nbr.join(a, "vid")
        val id = withHome.filter(col("dpart") === col("part"))
          .select(col("vid"), col("conn").as("id"))
        val ext = withHome.filter(col("dpart") =!= col("part"))
        // 3+4. best eligible move per vertex under the phase direction rule
        val dirOk =
          if (phase == 0) col("dpart") > col("part") else col("dpart") < col("part")
        val cand = ext.filter(dirOk)
          .join(id, Seq("vid"), "left")
          .withColumn("gain", col("conn") - coalesce(col("id"), lit(0L)))
          .filter(col("gain") > 0)
          .groupBy(col("vid"))
          .agg(max(struct(col("gain"), (-col("dpart")).as("np"))).as("b"),
            first(col("part")).as("from"))
          .select(col("vid"), col("from"), (-col("b.np")).as("to"),
            col("b.gain").as("gain"))
          .join(vw, "vid")
        // 5. admit by gain order within each target part's weight headroom
        val pw = a.join(vw, "vid").groupBy(col("part"))
          .agg(sum(col("vwgt")).as("pwgt"))
        val wAdmit = Window.partitionBy(col("to"))
          .orderBy(col("gain").desc, col("vid"))
        val admitted = cand
          .join(pw.withColumnRenamed("part", "to"), Seq("to"))
          .withColumn("cumIn", sum(col("vwgt")).over(
            wAdmit.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("pwgt") + col("cumIn") <= maxW)
          .select(col("vid"), col("to"))
        val next = a.join(admitted, Seq("vid"), "left")
          .select(col("vid"), coalesce(col("to"), col("part")).as("part"))
          .localCheckpoint(true)
        cur = next
      }
      val cut = GraphOps.edgeCut(edges, cur)
      val imb = GraphOps.imbalance(cur, vw, k)
      improved = cut < bestCut && imb <= ubFactor + 1e-9
      if (improved) { bestCut = cut; best = cur }
      pass += 1
    }
    sym.unpersist(); vw.unpersist()
    best
  }
}
