package graft.partitioner

import graft.plans.Plans.CheckpointOps
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
  *   5. balance feasibility under BOTH bounds for EVERY constraint
  *      (maxwgt/minwgt = tpwgts·tvwgt·ub^±1, reference
  *      kwayrefine.c:1056-1059; multi-constraint check
  *      IsHBalanceBetterTT kwayrefine_chunk.c:405-438): candidates are
  *      admitted in gain order under two cumulative-weight windows — the
  *      target part's inflow may not exceed its max headroom, and the
  *      source part's outflow may not drain it below the floor. Both
  *      prefixes are conservative (a candidate rejected by one window
  *      still counts in the other's prefix), so admitted move sets are
  *      always jointly feasible;
  *   6. pwgts re-synced from scratch per pass (S_par_sync_pwgts,
  *      kwayrefine.c:774-807) — consistent by construction in BSP;
  *   7. keep the best assignment seen (mincut tracking, kwayrefine.c:1186).
  *
  * When the greedy passes stall, distributed hill-scanning rounds (R2,
  * reference S_par_kwayrefine_HS src/kwayrefine.c:1217-1550) move connected
  * sets of up to 16 adjacent individually-stuck vertices whose COMBINED
  * gain is positive — see `hillMoves` below; serial
  * [[BoundaryFm.hillScan]] covers gathered boundaries on the small-level
  * dispatch path.
  *
  * Vertex weights are multi-constraint: `vertices(vid, vwgts array<bigint>)`
  * with `ncon` entries each (reference vwgt layout src/graph.h:44,55);
  * `targets` = per-part weight fractions (reference tpwgts), uniform by
  * default. [[refine]] is the scalar (ncon=1) wrapper.
  */
object Refinement {

  /** Scalar-weight entry point: vertices(vid, vwgt). */
  def refine(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
             assign0: DataFrame, k: Int, ubFactor: Double = 1.03,
             passes: Int = 8): DataFrame =
    refineMC(spark, edges,
      vertices.select(col("vid"), array(col("vwgt")).as("vwgts")),
      assign0, k, ubFactor, passes)

  /** Multi-constraint entry point: vertices(vid, vwgts array<bigint>).
    *
    * Scale shape (the two levers that took the finest level of the 130M-edge
    * V-cycle from ~870 s to a handful of edge scans):
    *   - `sym` is persisted REPARTITIONED BY src, so every per-vertex
    *     groupBy in the pass pipeline partial-aggregates V-sized output with
    *     ZERO additional exchange (HashPartitioning(src) already satisfies
    *     any grouping that starts with src/vid);
    *   - all V-sized state (assign, vwgts, admitted moves) joins the E-sized
    *     scans via [[GraphOps.dimSide]] broadcast when |V| is under the
    *     threshold — each BSP phase is then ONE map-only scan of the cached
    *     adjacency instead of a full-edge shuffle join. Above the threshold
    *     the same plan degrades gracefully to shuffle joins.
    */
  def refineMC(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
               assign0: DataFrame, k: Int, ubFactor: Double = 1.03,
               passes: Int = 8, ncon: Int = 1,
               targets: Array[Double] = null, nVerts: Long = -1L,
               minImpFrac: Double = 5e-4,
               hillMaxVerts: Long = 100000L): DataFrame = {
    val tgt = if (targets != null) targets else Array.fill(k)(1.0 / k)
    require(tgt.length == k, s"targets length ${tgt.length} != k=$k")
    if (vertices.isEmpty) return assign0
    val sym = GraphOps.symmetrize(edges).repartition(col("src")).persist()
    val vw = vertices.select(col("vid"), col("vwgts")).persist()
    val nV = if (nVerts >= 0) nVerts else vw.count()
    def dim(df: DataFrame): DataFrame = GraphOps.dimSide(df, nV)
    def wc(c: Int) = element_at(col("vwgts"), c + 1)
    val tvCols = (0 until ncon).map(c => sum(wc(c)).as(s"t$c"))
    val tvRow = vw.agg(tvCols.head, tvCols.tail: _*).head()
    val tv = (0 until ncon).map(c => tvRow.getLong(c)).toArray
    // per-(part, constraint) bounds: maxwgt/minwgt = tpwgts·tvwgt·ub^±1 —
    // k·ncon driver-side longs, inlined as literals into the admit
    // predicate (joins here would bloat the per-phase plan that Catalyst
    // re-optimizes on every action)
    val maxW = Array.tabulate(k, ncon)((p, c) =>
      math.ceil(tgt(p) * tv(c) * ubFactor).toLong)
    val minW = Array.tabulate(k, ncon)((p, c) =>
      math.floor(tgt(p) * tv(c) / ubFactor).toLong)
    // literal lookup column: keyCol == p -> values(p)(c)
    def byPart(keyCol: org.apache.spark.sql.Column,
               values: Int => Long): org.apache.spark.sql.Column =
      (0 until k).foldLeft(lit(Long.MinValue)) { (e, p) =>
        when(keyCol === p, lit(values(p))).otherwise(e)
      }
    // ONE action per pass for all three outputs (edge-cut, imbalance under
    // targets, AND the full per-(part, constraint) weights): the aggregates
    // ride a tagged union — per-pass driver job count is the BSP loop's
    // fixed cost, so metrics are batched. The weights are returned so the
    // hill phase can reuse the best assignment's pwgts instead of re-running
    // the same |V|-row join+agg (the greedy admit and this metric already
    // paid for it).
    def cutAndImbalance(a: DataFrame): (Long, Double, Array[Array[Long]]) = {
      val cutDf = edges
        .join(dim(a.select(col("vid").as("src"), col("part").as("sp"))), "src")
        .join(dim(a.select(col("vid").as("dst"), col("part").as("dp"))), "dst")
        .filter(col("sp") =!= col("dp"))
        .agg(coalesce(sum(col("wgt")), lit(0L)).as("v"))
        .select(lit(-1L).as("k"),
          array((col("v") +: Seq.fill(ncon - 1)(lit(0L))): _*).as("vs"))
      val pwDf = a.join(dim(vw), "vid").groupBy(col("part"))
        .agg((0 until ncon).map(c => sum(wc(c)).as(s"v$c")).head,
          (0 until ncon).map(c => sum(wc(c)).as(s"v$c")).tail: _*)
        .select(col("part").cast("long").as("k"),
          array((0 until ncon).map(c => col(s"v$c")): _*).as("vs"))
      val rows = cutDf.unionByName(pwDf).collect()
      val cut = rows.find(_.getLong(0) == -1L)
        .map(_.getSeq[Long](1).head).getOrElse(0L)
      val pws = rows.filter(_.getLong(0) >= 0)
      val pw = Array.ofDim[Long](k, ncon)
      pws.foreach { r =>
        val p = r.getLong(0).toInt
        val vs = r.getSeq[Long](1)
        (0 until ncon).foreach(c => pw(p)(c) = vs(c))
      }
      val imb = if (pws.isEmpty) 1.0
        else pws.map(r => r.getSeq[Long](1).head.toDouble /
          (tgt(r.getLong(0).toInt) * tv(0))).max
      (cut, imb, pw)
    }

    var best = assign0.select(col("vid"), col("part")).ckpt()
    var bestCut = GraphOps.edgeCut(edges, best, nV)

    // one greedy pass = the reference's two S_right_side phases.
    // Phase-0's checkpoint is folded into phase-1's and released — leaked
    // per-pass checkpoints pin O(passes·levels·|V|) rows otherwise.
    def onePass(a0: DataFrame): DataFrame = {
      var cur = a0
      for (phase <- 0 to 1) {
        val a = cur
        // 1. neighbor-partition aggregation (J5) — broadcast the V-sized
        // assignment; sym is partitioned by src, so the groupBy needs no
        // exchange and the per-task partial-agg map stays |V|/P-sized
        val nbr = sym
          .join(dim(a.select(col("vid").as("dst"), col("part").as("dpart"))),
            "dst")
          .groupBy(col("src").as("vid"), col("dpart"))
          .agg(sum(col("wgt")).as("conn"))
        val withHome = nbr.join(dim(a), "vid")
        // 3+4. best eligible move per vertex under the phase direction
        // rule, in ONE conditional aggregation (internal degree and best
        // external target fold into the same groupBy — no id/ext
        // self-join; gain ordering is unchanged since id is constant per
        // vertex)
        val dirOk =
          if (phase == 0) col("dpart") > col("part") else col("dpart") < col("part")
        val cand = withHome
          .groupBy(col("vid"), col("part"))
          .agg(
            max(when(col("dpart") === col("part"), col("conn"))).as("idw"),
            max(when(col("dpart") =!= col("part") && dirOk,
              struct(col("conn"), (-col("dpart")).as("np")))).as("b"))
          .filter(col("b").isNotNull)
          .withColumn("gain",
            col("b.conn") - coalesce(col("idw"), lit(0L)))
          .filter(col("gain") > 0)
          .select(col("vid"), col("part").as("from"), (-col("b.np")).as("to"),
            col("gain"))
          .join(dim(vw), "vid")
        // 5. admit by gain order within the target part's max headroom AND
        //    the source part's min floor, per constraint. Phase-start pwgts
        //    are k·ncon longs — gathered to the driver (one tiny job) and
        //    inlined, keeping the admit plan join-free on the bounds side
        val pwCols = (0 until ncon).map(c => sum(wc(c)).as(s"pw$c"))
        val pwRows = a.join(dim(vw), "vid").groupBy(col("part"))
          .agg(pwCols.head, pwCols.tail: _*).collect()
        val pw = Array.ofDim[Long](k, ncon)
        pwRows.foreach { r =>
          val p = r.get(0).toString.toInt
          (0 until ncon).foreach(c => pw(p)(c) = r.getLong(c + 1))
        }
        // pre-truncate to the top-`admitCap` gains per (part, hash bucket):
        // the exact per-part prefix windows below are single-task per part —
        // fine once bounded, a straggler if the boundary is O(V). Dropping
        // low-gain candidates only SHRINKS the admitted set (the feasibility
        // prefixes shrink with it), so admitted move sets stay jointly
        // feasible; dropped candidates get later passes.
        val admitBuckets = 32
        val admitCap = 1024
        val bkt = pmod(xxhash64(col("vid")), lit(admitBuckets))
        val wPreTo = Window.partitionBy(col("to"), col("bkt"))
          .orderBy(col("gain").desc, col("vid"))
        val wPreFrom = Window.partitionBy(col("from"), col("bkt"))
          .orderBy(col("gain").desc, col("vid"))
        val capped = cand.withColumn("bkt", bkt)
          .withColumn("rTo", row_number().over(wPreTo))
          .withColumn("rFrom", row_number().over(wPreFrom))
          .filter(col("rTo") <= admitCap && col("rFrom") <= admitCap)
          .drop("bkt", "rTo", "rFrom")
        val wTo = Window.partitionBy(col("to"))
          .orderBy(col("gain").desc, col("vid"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wFrom = Window.partitionBy(col("from"))
          .orderBy(col("gain").desc, col("vid"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val okCond = (0 until ncon).map { c =>
          (sum(wc(c)).over(wTo) <=
            byPart(col("to"), p => maxW(p)(c) - pw(p)(c))) &&
          (sum(wc(c)).over(wFrom) <=
            byPart(col("from"), p => pw(p)(c) - minW(p)(c)))
        }.reduce(_ && _)
        val admitted = capped
          .withColumn("ok", okCond)
          .filter(col("ok"))
          .select(col("vid"), col("to"))
        // Plans.checkpoint (not raw localCheckpoint): the metrics union
        // below sits directly above this LogicalRDD — the Spark 4.1
        // stale-constraint crash shape
        val next = graft.plans.Plans.checkpoint(
          a.join(dim(admitted), Seq("vid"), "left")
            .select(col("vid"), coalesce(col("to"), col("part")).as("part")))
        if (a ne a0) graft.plans.Plans.unpersist(a) // phase-0 intermediate
        cur = next
      }
      cur
    }

    // R2 hill-scanning, generalized to hills of up to `maxHill` vertices
    // (reference S_par_kwayrefine_HS src/kwayrefine.c:1217-1550 grows hills
    // to 16; hill gain identity S_build_hill :599-772): a connected
    // same-part set H of individually-stuck vertices (best single-move
    // gain <= 0 each) may still move TOGETHER with positive combined gain
    //   jgain(H -> p) = Σ_{v∈H} conn_v(p) − (Σ_{v∈H} id_v − 2·Σ_{e⊆H} w_e)
    // (edges inside H stay internal when the whole hill moves, so their
    // doubly-counted loss is refunded). Hills grow by `rounds` of J2-style
    // handshake merges on the CONTRACTED cluster graph — each round pairs
    // adjacent same-part clusters along their heaviest connecting edge
    // (maximizing the refund, the reference's BFS-growth analogue), so
    // round r reaches size 2^r ≤ maxHill. A cluster whose best jgain turns
    // positive is FROZEN — it stops growing and is queued for the move
    // phase, exactly the reference's stop-growing-when-profitable rule
    // (kwayrefine.c:652-700). Frozen hills are admitted under the same
    // dual balance windows as the greedy phases, with element-wise summed
    // hill weights. `phase` applies the S_right_side parity rule
    // (kwayrefine.c:142-167): hills move only to higher (phase 0) / lower
    // (phase 1) part ids per call, so two hills on opposite sides of the
    // same boundary cannot swap past each other in one BSP step. Returns
    // None when no hill is admitted.
    def hillMoves(a: DataFrame, phase: Int, rounds: Int = 4,
                  maxHill: Int = 16,
                  pwIn: Array[Array[Long]] = null): Option[DataFrame] = {
      val nbr = sym
        .join(dim(a.select(col("vid").as("dst"), col("part").as("dpart"))),
          "dst")
        .groupBy(col("src").as("vid"), col("dpart"))
        .agg(sum(col("wgt")).as("conn"))
      val home = nbr.join(dim(a), "vid")
      // stuck boundary vertices: some external connectivity, but every
      // single-vertex move is non-improving
      val stuck = home.groupBy(col("vid"), col("part"))
        .agg(
          coalesce(max(when(col("dpart") === col("part"), col("conn"))),
            lit(0L)).as("idw"),
          max(when(col("dpart") =!= col("part"), col("conn"))).as("maxconn"))
        .filter(col("maxconn").isNotNull && col("maxconn") <= col("idw"))
        .select(col("vid"), col("part").as("from"), col("idw")).ckpt()
      // the stuck subgraph (same-part edges between stuck vertices) — the
      // only edges hills can grow along; fixed across rounds
      val se = sym.filter(col("src") < col("dst"))
        .join(dim(stuck.select(col("vid").as("src"), col("from"))), "src")
        .join(dim(stuck.select(col("vid").as("dst"), col("from").as("fd"))),
          "dst")
        .filter(col("from") === col("fd"))
        .select(col("src"), col("dst"), col("wgt")).ckpt()
      // stuck vertices' connectivity into foreign parts (hill gain inputs;
      // fixed across rounds — nothing moves until the final admit)
      val extConn = home.filter(col("dpart") =!= col("part"))
        .join(dim(stuck.select(col("vid"))), "vid")
        .select(col("vid"), col("dpart").as("to"), col("conn")).ckpt()
      val hillDir =
        if (phase == 0) col("to") > col("from") else col("to") < col("from")

      var memb = stuck.select(col("vid"), col("vid").as("cid")).ckpt()
      var frozenIds: DataFrame = null // cids already queued for the move
      var cands = List.empty[DataFrame] // (cid, from, to, gain) per round
      var r = 0
      var progressed = true
      while (r < rounds && progressed) {
        r += 1
        // contracted cluster graph over growable (non-frozen) clusters,
        // capped so merged hills stay ≤ maxHill members
        val sizes = memb.groupBy(col("cid")).agg(count(lit(1)).as("n"))
        var ce = se
          .join(dim(memb.select(col("vid").as("src"), col("cid").as("ua"))),
            "src")
          .join(dim(memb.select(col("vid").as("dst"), col("cid").as("va"))),
            "dst")
          .filter(col("ua") =!= col("va"))
          .select(least(col("ua"), col("va")).as("ua"),
            greatest(col("ua"), col("va")).as("va"), col("wgt"))
          .groupBy(col("ua"), col("va")).agg(sum(col("wgt")).as("w"))
        if (frozenIds != null) {
          ce = ce
            .join(frozenIds.select(col("cid").as("ua")), Seq("ua"), "left_anti")
            .join(frozenIds.select(col("cid").as("va")), Seq("va"), "left_anti")
        }
        ce = ce
          .join(sizes.select(col("cid").as("ua"), col("n").as("na")), "ua")
          .join(sizes.select(col("cid").as("va"), col("n").as("nb")), "va")
          .filter(col("na") + col("nb") <= maxHill)
          .select(col("ua"), col("va"), col("w"))
        // handshake: every cluster proposes its heaviest connecting edge;
        // mutual proposals merge (larger cid folds into smaller)
        val props = ce.select(col("ua").as("cid"), col("va").as("p"), col("w"))
          .unionByName(
            ce.select(col("va").as("cid"), col("ua").as("p"), col("w")))
          .groupBy(col("cid"))
          .agg(max(struct(col("w"), (-col("p")).as("np"))).as("b"))
          .select(col("cid"), (-col("b.np")).as("p"))
        // checkpoint + count BEFORE the old memb is released: merges'
        // lineage runs through it, and a released local checkpoint cannot
        // be recomputed
        val merges = props.as("x")
          .join(props.as("y"),
            col("x.p") === col("y.cid") && col("y.p") === col("x.cid"))
          .filter(col("x.cid") < col("x.p"))
          .select(col("x.p").as("oldCid"), col("x.cid").as("newCid"))
          .ckpt()
        val nMerged = merges.count()
        val membNext = memb
          .join(merges.withColumnRenamed("oldCid", "cid"), Seq("cid"), "left")
          .select(col("vid"), coalesce(col("newCid"), col("cid")).as("cid"))
          .ckpt()
        graft.plans.Plans.unpersist(merges)
        graft.plans.Plans.unpersist(memb)
        memb = membNext
        // evaluate every growable cluster's best jgain on the merged
        // clustering; positive ones freeze
        val withFrom = memb.join(stuck, "vid")
        var idSum = withFrom.groupBy(col("cid"), col("from"))
          .agg(sum(col("idw")).as("idSum"))
        if (frozenIds != null)
          idSum = idSum.join(frozenIds, Seq("cid"), "left_anti")
        val refund = se
          .join(dim(memb.select(col("vid").as("src"), col("cid").as("ua"))),
            "src")
          .join(dim(memb.select(col("vid").as("dst"), col("cid").as("va"))),
            "dst")
          .filter(col("ua") === col("va"))
          .groupBy(col("ua").as("cid")).agg(sum(col("wgt")).as("iw"))
          .select(col("cid"), (lit(2L) * col("iw")).as("refund"))
        val conn = extConn.join(memb, "vid")
          .groupBy(col("cid"), col("to")).agg(sum(col("conn")).as("cconn"))
        val gains = idSum
          .join(refund, Seq("cid"), "left")
          .join(conn, "cid")
          .filter(hillDir)
          .withColumn("jgain", col("cconn") - col("idSum") +
            coalesce(col("refund"), lit(0L)))
          .filter(col("jgain") > 0)
          .groupBy(col("cid"), col("from"))
          .agg(max(struct(col("jgain"), (-col("to")).as("nt"))).as("b"))
          .select(col("cid"), col("from"), (-col("b.nt")).as("to"),
            col("b.jgain").as("gain")).ckpt()
        val nFrozen = gains.count()
        if (nFrozen > 0) {
          cands = gains :: cands
          val fNext = (if (frozenIds == null) gains.select(col("cid"))
            else frozenIds.unionByName(gains.select(col("cid")))).ckpt()
          if (frozenIds != null) graft.plans.Plans.unpersist(frozenIds)
          frozenIds = fNext
        } else graft.plans.Plans.unpersist(gains)
        // no merge and no new freeze -> later rounds are identical
        progressed = nMerged > 0 || nFrozen > 0
      }
      graft.plans.Plans.unpersist(stuck)
      graft.plans.Plans.unpersist(se)
      graft.plans.Plans.unpersist(extConn)
      if (frozenIds != null) graft.plans.Plans.unpersist(frozenIds)
      if (cands.isEmpty) {
        graft.plans.Plans.unpersist(memb)
        return None
      }
      // admit frozen hills by gain order under both balance windows, with
      // per-constraint hill weights summed over final memberships
      val hills = cands.reduce(_ unionByName _)
      val hwCols = (0 until ncon).map(c => sum(wc(c)).as(s"hw$c"))
      val hw = memb.join(dim(vw), "vid").groupBy(col("cid"))
        .agg(hwCols.head, hwCols.tail: _*)
      val units = hills.join(hw, "cid")
        .withColumn("vwgts",
          array((0 until ncon).map(c => col(s"hw$c")): _*))
      // phase-start pwgts: reuse the caller's (cutAndImbalance already
      // aggregated them for this exact assignment); recompute only when the
      // caller has none yet (hills on a never-measured assignment)
      val pw = if (pwIn != null) pwIn else {
        val pwRows = a.join(dim(vw), "vid").groupBy(col("part"))
          .agg((0 until ncon).map(c => sum(wc(c)).as(s"pw$c")).head,
            (0 until ncon).map(c => sum(wc(c)).as(s"pw$c")).tail: _*).collect()
        val arr = Array.ofDim[Long](k, ncon)
        pwRows.foreach { r =>
          val p = r.get(0).toString.toInt
          (0 until ncon).foreach(c => arr(p)(c) = r.getLong(c + 1))
        }
        arr
      }
      val wTo = Window.partitionBy(col("to"))
        .orderBy(col("gain").desc, col("cid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFrom = Window.partitionBy(col("from"))
        .orderBy(col("gain").desc, col("cid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val okCond = (0 until ncon).map { c =>
        (sum(wc(c)).over(wTo) <=
          byPart(col("to"), p => maxW(p)(c) - pw(p)(c))) &&
        (sum(wc(c)).over(wFrom) <=
          byPart(col("from"), p => pw(p)(c) - minW(p)(c)))
      }.reduce(_ && _)
      val admitted = units.withColumn("ok", okCond).filter(col("ok"))
        .select(col("cid"), col("to")).ckpt()
      cands.foreach(graft.plans.Plans.unpersist) // per-round gains released
      if (admitted.isEmpty) {
        graft.plans.Plans.unpersist(admitted)
        graft.plans.Plans.unpersist(memb)
        return None
      }
      val moved = admitted.join(memb, "cid").select(col("vid"), col("to"))
      val out = graft.plans.Plans.checkpoint(
        a.join(moved, Seq("vid"), "left")
          .select(col("vid"), coalesce(col("to"), col("part")).as("part")))
      graft.plans.Plans.unpersist(admitted)
      graft.plans.Plans.unpersist(memb)
      Some(out)
    }

    var cur = best
    var pass = 0
    var improved = true
    // per-part weights of the CURRENT best assignment (threaded into the
    // hill phases); null until the first cutAndImbalance measures it
    var bestPw: Array[Array[Long]] = null
    while (pass < passes && improved) {
      val tPass = System.nanoTime()
      val in = cur
      cur = onePass(in)
      if (in ne best) graft.plans.Plans.unpersist(in)
      val (cut, imb, pwCur) = cutAndImbalance(cur)
      val better = cut < bestCut && imb <= ubFactor + 1e-9
      // convergence stop: keep ANY improvement, but only spend another
      // full-edge-scan pass when this one beat the relative floor
      // (measured: passes 2–6 at the finest level bought 0.06% of cut for
      // ~20 s; the reference's serial pass costs ~nothing, ours is 3 edge
      // scans)
      improved = better && cut + (bestCut * minImpFrac).toLong < bestCut
      if (better) {
        val oldBest = best
        bestCut = cut; best = cur; bestPw = pwCur
        if (oldBest ne cur) graft.plans.Plans.unpersist(oldBest)
      }
      System.err.println(f"[refine] pass=$pass nV=$nV cut=$cut " +
        f"imb=$imb%.4f t=${(System.nanoTime() - tPass) / 1e9}%.1fs")
      pass += 1
    }
    if (cur ne best) graft.plans.Plans.unpersist(cur)
    // hill rounds once greedy stalls (the reference runs HS when the greedy
    // pass stops improving): one round per direction — move jointly-
    // profitable hills, then one greedy clean-up pass around the moved
    // hills. Bounded to levels ≤ hillMaxVerts: each hill phase costs ~6
    // edge scans plus per-round cluster joins, and at the two finest levels
    // of the 26.5M-edge profile the 40.7 s spent bought 0.003% of cut —
    // fine-level boundaries are greedy-converged; hills earn their keep on
    // the coarse levels where moves are coupled (and cost ~nothing there)
    for (hsPhase <- 0 to 1 if nV <= hillMaxVerts) {
      val tHill = System.nanoTime()
      hillMoves(best, hsPhase, pwIn = bestPw).foreach { afterHills =>
        val next = onePass(afterHills)
        graft.plans.Plans.unpersist(afterHills)
        val (cut, imb, pwNext) = cutAndImbalance(next)
        if (cut < bestCut && imb <= ubFactor + 1e-9) {
          val oldBest = best
          bestCut = cut; best = next; bestPw = pwNext
          graft.plans.Plans.unpersist(oldBest)
        } else graft.plans.Plans.unpersist(next)
      }
      System.err.println(f"[refine] hills phase=$hsPhase nV=$nV " +
        f"t=${(System.nanoTime() - tHill) / 1e9}%.1fs")
    }
    sym.unpersist(); vw.unpersist()
    best
  }
}
