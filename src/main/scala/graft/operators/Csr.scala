package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** CSR-encoded Dataset partitions (north rule: analytics "over CSR-encoded
  * Dataset partitions"). One typed row per block holds the compressed-
  * sparse-row slice of the symmetrized adjacency — the Spark re-expression
  * of the reference's per-thread CSR slices (`xadj[t]/adjncy[t]/adjwgt[t]`,
  * reference src/graph.h:53-57) with edge-balanced placement
  * (S_par_distribute_blockcyclic, src/graph.c:1369-1454).
  *
  * Two placements:
  *   - [[build]] — contiguous vid ranges with ≈equal edges
  *     ([[GraphOps.edgeBalancedRanges]]); simple, but a power-law hub bigger
  *     than the quota still lands whole in one block;
  *   - [[buildBalanced]] — edge-granular ([[GraphOps.edgeBalancedSym]]):
  *     hub adjacency is SPLIT across blocks, so no task exceeds the quota —
  *     the skew-proof layout the scaling bench uses (north rule P15).
  *     A vertex may then appear in several blocks with partial adjacency;
  *     consumers aggregate across blocks (PR contributions already do).
  */
object Csr {

  /** One CSR slice. `dstVids`/`adjLocal` are the block-local destination
    * dictionary: `adjncy(j) == dstVids(adjLocal(j))` — precomputed at build
    * so per-iteration kernels accumulate into primitive arrays indexed by
    * `adjLocal` (zero allocation per edge; a boxed per-edge map measured as
    * a GC collapse at scale).
    */
  case class Block(blockId: Int, vids: Array[Long], xadj: Array[Int],
                   adjncy: Array[Long], wgts: Array[Long],
                   dstVids: Array[Long], adjLocal: Array[Int]) {
    def nvtxs: Int = vids.length
    def nedges: Int = adjncy.length
  }

  /** mapPartitions CSR assembly over (blockId, src, dst, wgt) rows sorted by
    * (blockId, src, dst) within partitions.
    */
  private def assemble(spark: SparkSession, symWithBlock: DataFrame,
                       numParts: Int): Dataset[Block] = {
    import spark.implicits._
    symWithBlock
      .repartition(numParts, col("blockId"))
      .sortWithinPartitions(col("blockId"), col("src"), col("dst"))
      .select(col("blockId"), col("src"), col("dst"), col("wgt"))
      .as[(Int, Long, Long, Long)]
      .mapPartitions { it =>
        // a partition may hold several blockIds (hash collisions) — each is
        // a contiguous run after the sort
        val out = mutable.ArrayBuffer.empty[Block]
        var curBlock = -1
        var curSrc = Long.MinValue
        val vids = mutable.ArrayBuffer.empty[Long]
        val degs = mutable.ArrayBuffer.empty[Int]
        val adjncy = mutable.ArrayBuffer.empty[Long]
        val wgts = mutable.ArrayBuffer.empty[Long]
        def closeBlock(): Unit = if (curBlock >= 0) {
          val xadj = new Array[Int](degs.length + 1)
          var i = 0
          while (i < degs.length) { xadj(i + 1) = xadj(i) + degs(i); i += 1 }
          val adj = adjncy.toArray
          val dstVids = adj.distinct.sorted
          val adjLocal = new Array[Int](adj.length)
          i = 0
          while (i < adj.length) {
            adjLocal(i) = java.util.Arrays.binarySearch(dstVids, adj(i))
            i += 1
          }
          out += Block(curBlock, vids.toArray, xadj, adj, wgts.toArray,
            dstVids, adjLocal)
          vids.clear(); degs.clear(); adjncy.clear(); wgts.clear()
          curSrc = Long.MinValue
        }
        it.foreach { case (b, s, d, w) =>
          if (b != curBlock) { closeBlock(); curBlock = b }
          if (s != curSrc) { vids += s; degs += 0; curSrc = s }
          degs(degs.length - 1) += 1
          adjncy += d
          wgts += w
        }
        closeBlock()
        out.iterator
      }
  }

  /** vid-range blocks under [[GraphOps.edgeBalancedRanges]] boundaries. */
  def build(spark: SparkSession, edges: DataFrame,
            bounds: Array[Long]): Dataset[Block] = {
    val sym = GraphOps.symmetrize(edges)
      .withColumn("blockId", GraphOps.rangeIdFor(col("src"), bounds))
    assemble(spark, sym, bounds.length)
  }

  /** Edge-granular balanced blocks — splits hubs (P15). */
  def buildBalanced(spark: SparkSession, edges: DataFrame,
                    numBlocks: Int): Dataset[Block] =
    assemble(spark, GraphOps.edgeBalancedSym(edges, numBlocks), numBlocks)

  /** Per-block stats (the lineage/debug view; also the oracle-checked
    * query surface for the CSR layout).
    */
  def stats(spark: SparkSession, blocks: Dataset[Block]): DataFrame = {
    import spark.implicits._
    blocks.map(b => (b.blockId, b.nvtxs, b.nedges))
      .toDF("block_id", "nvtxs", "nedges")
      .groupBy(col("block_id"))
      .agg(sum(col("nvtxs")).as("nvtxs"), sum(col("nedges")).as("nedges"))
  }

  /** PageRank power iteration over CSR blocks, engineered so the per-
    * iteration data movement is O(V) rank rows — never the CSR arrays:
    *
    *   - blocks are hash-partitioned on blockId ONCE and persisted; the
    *     per-iteration rank-distribution table is repartitioned to the same
    *     (key, numPartitions) layout, so the block⋈ranks join needs no
    *     exchange on the heavy side;
    *   - the kernel walks the CSR arrays and partially aggregates
    *     contributions per destination in a primitive LongMap (map-side
    *     combine over the cache-friendly slice);
    *   - one groupBy(dst) shuffle completes the sum — the irreducible
    *     communication of distributed PR.
    *
    * Correct for split vertices ([[buildBalanced]]): wdeg is aggregated
    * globally across blocks, and per-block partial contributions merge in
    * the final aggregate.
    */
  /** Prepared, persisted per-iteration state. */
  case class PrState(blocksP: Dataset[Block], wdeg: DataFrame,
                     vidBlock: DataFrame, verts: DataFrame, n: Long,
                     nBlocks: Int, numParts: Int) {
    def unpersistAll(): Unit = {
      wdeg.unpersist(); vidBlock.unpersist()
      blocksP.unpersist(); verts.unpersist()
    }
  }

  def prepare(spark: SparkSession, blocks: Dataset[Block], vertices: DataFrame,
              numParts: Int = 32): PrState = {
    import spark.implicits._
    val verts = vertices.select(col("vid")).distinct()
      .repartition(numParts, col("vid")).persist()
    val n = verts.count()
    val nBlocks = blocks.select(max(col("blockId"))).head().getInt(0) + 1
    val blocksP = blocks.repartition(nBlocks, col("blockId")).persist()
    blocksP.count()
    // global weighted out-degree: per-block partial sums, then merge
    // (a vertex may be split across blocks)
    val wdeg = blocksP.flatMap { b =>
      b.vids.indices.iterator.map { i =>
        var s = 0L
        var j = b.xadj(i)
        while (j < b.xadj(i + 1)) { s += b.wgts(j); j += 1 }
        (b.vids(i), s)
      }
    }.toDF("vid", "w").groupBy(col("vid")).agg(sum(col("w")).as("wdeg"))
      .repartition(numParts, col("vid")).persist()

    // vid → owning blocks (1..k rows per vid), computed once; partitioned
    // like the rank table so the per-iteration join needs no exchange
    val vidBlock = blocksP
      .flatMap(b => b.vids.iterator.map(v => (v, b.blockId)))
      .toDF("vid", "blockId").repartition(numParts, col("vid")).persist()
    wdeg.count(); vidBlock.count()
    PrState(blocksP, wdeg, vidBlock, verts, n, nBlocks, numParts)
  }

  /** `iters` power iterations over prepared state.
    *
    * `checkpointEvery`: materialize (localCheckpoint) the rank table every k
    * iterations — truncates lineage and bounds plan depth for long runs.
    * 0 = never: the whole loop builds one lazy plan executed by a single
    * action, removing the per-iteration job-submit + write barrier (right
    * for short fixed-iteration kernels, e.g. the scaling bench).
    */
  def iterate(spark: SparkSession, st: PrState, damping: Double,
              iters: Int, checkpointEvery: Int = 1): DataFrame = {
    import spark.implicits._
    val PrState(blocksP, wdeg, vidBlock, verts, n, nBlocks, _) = st
    // iterate over CONNECTED vertices only (wdeg's key set): in a symmetric
    // graph every connected vertex receives a positive contribution each
    // round, so no per-iteration left join against the full vertex set is
    // needed; isolated vertices hold the constant (1-d)/n and are appended
    // once at the end.
    var ranks = wdeg.select(col("vid")).withColumn("rank", lit(1.0 / n))
    for (it <- 1 to iters) {
      // ship each vid's share to every block holding a slice of it; the two
      // collect_lists are order-aligned (one aggregation pass feeds both).
      // Exchange the small (blockId, vid, share) rows BEFORE aggregating —
      // the groupBy then runs in place on the block-aligned layout.
      val byBlock = vidBlock
        .join(ranks.join(wdeg, "vid"), "vid")
        .select(col("blockId"), col("vid"),
          (col("rank") / col("wdeg")).cast("double").as("share"))
        .repartition(nBlocks, col("blockId"))
        .groupBy(col("blockId"))
        .agg(collect_list(col("vid")).as("vs"),
          collect_list(col("share")).as("ss"))
      val contribs = blocksP
        .joinWith(byBlock, blocksP("blockId") === byBlock("blockId"))
        .flatMap { case (b, row) =>
          // all-primitive kernel: share aligned to the sorted b.vids via
          // binary search; contributions accumulate into a double[] indexed
          // by the precomputed block-local dst dictionary — no per-edge
          // allocation (a boxed map here measured as GC collapse/OOM)
          val vs = row.getSeq[Long](1)
          val ss = row.getSeq[Double](2)
          val share = new Array[Double](b.nvtxs)
          var q = 0
          while (q < vs.length) {
            val idx = java.util.Arrays.binarySearch(b.vids, vs(q))
            if (idx >= 0) share(idx) = ss(q)
            q += 1
          }
          val acc = new Array[Double](b.dstVids.length)
          var i = 0
          while (i < b.nvtxs) {
            val s = share(i)
            if (s != 0.0) {
              var j = b.xadj(i)
              while (j < b.xadj(i + 1)) {
                acc(b.adjLocal(j)) += s * b.wgts(j)
                j += 1
              }
            }
            i += 1
          }
          b.dstVids.indices.iterator
            .filter(k => acc(k) != 0.0)
            .map(k => (b.dstVids(k), acc(k)))
        }.toDF("vid", "partial")
        // pre-partition by key BEFORE the aggregate: the kernel already did
        // map-side combining, so Spark's partial hash-agg would only build a
        // giant (≈|V|-key) per-task map — measured to thrash memory at high
        // parallelism. After the exchange each task aggregates ~|V|/P keys
        // (cache-resident), and the partitioning already satisfies the
        // grouping, so no further shuffle.
        .repartition(st.numParts, col("vid"))
        .groupBy(col("vid")).agg(sum(col("partial")).as("contrib"))
      val next = contribs.select(col("vid"),
        (lit((1 - damping) / n) +
          lit(damping) * col("contrib")).as("rank"))
      ranks =
        // Plans.checkpoint, not raw localCheckpoint: a consumer that unions
        // the returned ranks would hit Spark 4.1's stale-constraint crash
        // (UnionBase.rewriteConstraints; see Plans.checkpoint scaladoc)
        if (checkpointEvery > 0 && it % checkpointEvery == 0)
          graft.plans.Plans.checkpoint(next)
        else next
    }
    verts.join(ranks, Seq("vid"), "left")
      .select(col("vid"),
        coalesce(col("rank"), lit((1 - damping) / n)).as("rank"))
  }

  def pageRank(spark: SparkSession, blocks: Dataset[Block], vertices: DataFrame,
               damping: Double = 0.85, iters: Int = 10,
               numParts: Int = 32): DataFrame = {
    val st = prepare(spark, blocks, vertices, numParts)
    val ranks = iterate(spark, st, damping, iters)
    st.unpersistAll()
    ranks
  }
}
