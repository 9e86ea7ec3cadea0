package graft.operators

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import graft.plans.Plans.CheckpointOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Block-synchronous PageRank over CSR blocks with PRECOMPUTED routing —
  * the communication pattern of the reference's per-thread CSR engine
  * (thread-local slices + bulk exchanges, reference src/graph.c:1369-1454
  * placement and the par_* BSP loops) re-expressed as raw RDD block
  * exchange, bypassing Catalyst entirely inside the loop.
  *
  * Why this exists next to [[Csr.iterate]] (the DataFrame path): profiling
  * showed the per-iteration cost at 68M edges was NOT the kernel (~1 CPU-s)
  * but the O(V)-row relational plumbing — three narrow joins, a
  * repartition, Dataset↔row decode — burning ~90 CPU-s/iteration of pure
  * memory-bandwidth overhead that anti-scales on one box (NOTES.md round
  * 2). Here an iteration is exactly TWO shuffles of dense double[] blocks:
  *
  *   1. shares:   rank partition rp → block b: one double[] per (rp, b)
  *                carrying rank/wdeg for precisely the source vids b owns
  *                from rp (routing precomputed at prepare);
  *   2. kernel:   per block, scatter shares via precomputed positions, walk
  *                the CSR arrays, accumulate into the block-local dst
  *                dictionary (zero per-edge allocation);
  *   3. contribs: block b → rank partition rp: one double[] per (b, rp)
  *                aligned to precomputed dst positions; the rank partition
  *                merges incoming blocks in blockId order (deterministic
  *                float sums) and applies the damping update.
  *
  * All `iters` iterations build ONE lazy RDD lineage executed by a single
  * action — per-iteration fixed cost is a stage barrier, not a
  * job-submit + Catalyst replan. Both sides of every exchange derive their
  * index arrays from the same sorted vid lists, so alignment is by
  * construction, and every message is a dense primitive array (~8
  * bytes/element vs ~40+ bytes and a hash probe per row in the relational
  * shuffle). On a real cluster this is the classic MPI PageRank exchange;
  * partition → executor, shuffle → network.
  */
object CsrFast {

  /** key IS the partition id (blockId or rank-partition id). */
  private final class IdPartitioner(n: Int) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = key.asInstanceOf[Int]
    override def equals(other: Any): Boolean = other match {
      case p: IdPartitioner => p.numPartitions == n
      case _ => false
    }
    override def hashCode: Int = n
  }

  private def rpOf(vid: Long, numParts: Int): Int = {
    val r = (vid % numParts).toInt
    if (r < 0) r + numParts else r
  }

  /** Rank-partition state: sorted vid dictionary + aligned wdeg, plus the
    * per-block routing (send: which dict indices each block needs as
    * sources; recv: which dict positions each block's contributions add
    * into). Both sorted by blockId.
    */
  final case class RpState(rp: Int, vids: Array[Long], wdeg: Array[Long],
                           sendBlocks: Array[Int], sendIdx: Array[Array[Int]],
                           recvBlocks: Array[Int], recvIdx: Array[Array[Int]])

  /** Block state: the CSR slice + per-rank-partition routing (gather:
    * positions in block.vids the rp's share array scatters into; scatter:
    * positions in block.dstVids each outgoing contribution array reads
    * from). Both sorted by rp.
    */
  /** `wgtsI` replaces `block.wgts` (stripped): the kernel streams
    * xadj/adjLocal/weights once per iteration, and at 10^8+ directed edges
    * the weight array is the single largest stream — 4-byte ints halve it
    * vs longs. Exact: co-occurrence edge weights are bounded by turns per
    * conversation (prepare() enforces the Int range).
    */
  final case class BlockState(block: Csr.Block, wgtsI: Array[Int],
                              gatherRps: Array[Int], gatherIdx: Array[Array[Int]],
                              scatterRps: Array[Int], scatterIdx: Array[Array[Int]])

  final case class FastState(blockStates: RDD[BlockState], rpStates: RDD[RpState],
                             n: Long, nBlocks: Int, numParts: Int) {
    def unpersistAll(): Unit = { blockStates.unpersist(); rpStates.unpersist() }
  }

  /** Group sorted vids of one block by rank partition, keeping index
    * positions; returns (rp, positions) sorted by rp.
    */
  private def routeByRp(vids: Array[Long], numParts: Int): (Array[Int], Array[Array[Int]]) = {
    // counting sort over the (small, dense) rp domain — the boxed-TreeMap
    // version of this cost 570 CPU-s at 130M edges (one boxed Integer probe
    // per dictionary entry); two primitive passes cost ~nothing
    val counts = new Array[Int](numParts)
    var i = 0
    while (i < vids.length) { counts(rpOf(vids(i), numParts)) += 1; i += 1 }
    var nz = 0
    var p = 0
    while (p < numParts) { if (counts(p) > 0) nz += 1; p += 1 }
    val rps = new Array[Int](nz)
    val idx = new Array[Array[Int]](nz)
    val slot = new Array[Int](numParts)
    var k = 0
    p = 0
    while (p < numParts) {
      if (counts(p) > 0) { rps(k) = p; idx(k) = new Array[Int](counts(p)); slot(p) = k; k += 1 }
      p += 1
    }
    val fill = new Array[Int](nz)
    i = 0
    while (i < vids.length) {
      val s = slot(rpOf(vids(i), numParts))
      idx(s)(fill(s)) = i; fill(s) += 1
      i += 1
    }
    (rps, idx)
  }

  /** `vertices` supplies the FULL vertex set (isolated vertices included):
    * the damping base (1-d)/n counts them, exactly as [[Csr.prepare]] does.
    */
  def prepare(spark: SparkSession, blocks: Dataset[Csr.Block],
              vertices: DataFrame, numParts: Int): FastState = {
    // repartition before distinct: same partial-agg cardinality guard as
    // GraphOps.degrees (NOTES.md — high-cardinality agg anti-scales)
    val nTotal = vertices.select(col("vid"))
      .repartition(col("vid")).distinct().count()
    val nBlocks = blocks.select(max(col("blockId"))).head().getInt(0) + 1
    val idB = new IdPartitioner(nBlocks)
    val idR = new IdPartitioner(numParts)
    // one block per partition (identity layout)
    val bRdd = blocks.rdd.map(b => (b.blockId, b)).partitionBy(idB)
      .mapPartitions(_.map(_._2), preservesPartitioning = true)
    // localCheckpoint (RDD flavour, not the Dataset one from NOTES.md):
    // persist + TRUNCATE lineage, so the upstream Dataset scan and
    // partitionBy shuffle files become GC-able — on a tmpfs shuffle dir
    // those prep files would otherwise pin tens of GB of RAM for the whole
    // session
    val blockStates = bRdd.map { b =>
      val (gRps, gIdx) = routeByRp(b.vids, numParts)
      val (sRps, sIdx) = routeByRp(b.dstVids, numParts)
      val wgtsI = new Array[Int](b.wgts.length)
      var j = 0
      while (j < wgtsI.length) {
        val w = b.wgts(j)
        require(w >= Int.MinValue && w <= Int.MaxValue,
          s"edge weight $w exceeds Int range (CsrFast packs weights as 4-byte ints)")
        wgtsI(j) = w.toInt
        j += 1
      }
      // strip the global-id adjacency AND the long weights: the kernel
      // walks xadj/adjLocal/wgtsI only (adjncy(j) == dstVids(adjLocal(j))
      // by construction; wgtsI above), so keeping either would pin 8+8
      // bytes per directed edge of dead weight in the persisted state —
      // the difference between fitting the scaling graph in the default
      // heap and GC-thrashing
      BlockState(b.copy(adjncy = Array.emptyLongArray,
        wgts = Array.emptyLongArray), wgtsI, gRps, gIdx, sRps, sIdx)
    }.localCheckpoint()
    // global wdeg (a vertex may be split across blocks), keyed to its rank
    // partition
    val vidPart = new Partitioner {
      def numPartitions: Int = numParts
      def getPartition(key: Any): Int = rpOf(key.asInstanceOf[Long], numParts)
    }
    val wdegRdd = blockStates.flatMap { bs =>
      val b = bs.block
      b.vids.indices.iterator.map { i =>
        var s = 0L
        var j = b.xadj(i)
        while (j < b.xadj(i + 1)) { s += bs.wgtsI(j); j += 1 }
        (b.vids(i), s)
      }
    }.reduceByKey(vidPart, _ + _)
    // vid lists each block exchanges with each rp (sorted by construction:
    // block vids/dstVids are sorted, filtering preserves order)
    val srcReq = blockStates.flatMap { bs =>
      bs.gatherRps.indices.iterator.map { k =>
        (bs.gatherRps(k), (bs.block.blockId, bs.gatherIdx(k).map(bs.block.vids)))
      }
    }.partitionBy(idR)
    val dstReq = blockStates.flatMap { bs =>
      bs.scatterRps.indices.iterator.map { k =>
        (bs.scatterRps(k), (bs.block.blockId, bs.scatterIdx(k).map(bs.block.dstVids)))
      }
    }.partitionBy(idR)
    val np = numParts
    val rpStates = wdegRdd.zipPartitions(srcReq, dstReq) { (wIt, sIt, dIt) =>
      val pairs = wIt.toArray.sortBy(_._1)
      if (pairs.isEmpty) {
        // a vid requested by a block always has degree > 0 (symmetric
        // graph), so an empty dict implies no requests either
        sIt.foreach(_ => ()); dIt.foreach(_ => ())
        Iterator.empty
      } else {
        val vids = pairs.map(_._1)
        val wdeg = pairs.map(_._2)
        def resolve(reqs: Iterator[(Int, (Int, Array[Long]))]): (Array[Int], Array[Array[Int]]) = {
          val arr = reqs.map(_._2).toArray.sortBy(_._1)
          val bIds = arr.map(_._1)
          // reqVids is ascending (block vids/dstVids are sorted and the
          // rp-filter preserves order), so one merge scan per block replaces
          // a binary search per element (433 CPU-s at 130M edges)
          val idx = arr.map { case (_, reqVids) =>
            val out = new Array[Int](reqVids.length)
            var p = 0
            var q = 0
            while (q < reqVids.length) {
              while (p < vids.length && vids(p) < reqVids(q)) p += 1
              require(p < vids.length && vids(p) == reqVids(q),
                s"requested vid ${reqVids(q)} missing from rank partition dict")
              out(q) = p
              q += 1
            }
            out
          }
          (bIds, idx)
        }
        val (sb, si) = resolve(sIt)
        val (rb, ri) = resolve(dIt)
        Iterator(RpState(rpOf(vids(0), np), vids, wdeg, sb, si, rb, ri))
      }
    }.localCheckpoint()
    rpStates.count(); blockStates.count()
    FastState(blockStates, rpStates, nTotal, nBlocks, numParts)
  }

  /** `iters` damped power iterations; returns the final per-partition rank
    * arrays (aligned to each RpState dict). ONE action executes the whole
    * lineage.
    */
  def iterate(st: FastState, damping: Double, iters: Int): RDD[(Int, Array[Double])] = {
    val idB = new IdPartitioner(st.nBlocks)
    val idR = new IdPartitioner(st.numParts)
    val n = st.n
    val base = (1.0 - damping) / n
    var ranks: RDD[(Int, Array[Double])] = st.rpStates.map { rp =>
      (rp.rp, Array.fill(rp.vids.length)(1.0 / n))
    }
    for (_ <- 1 to iters) {
      val shares = st.rpStates.zipPartitions(ranks) { (rpIt, rkIt) =>
        if (!rpIt.hasNext) Iterator.empty
        else {
          val rp = rpIt.next()
          val rk = rkIt.next()._2
          rp.sendBlocks.indices.iterator.map { k =>
            val idx = rp.sendIdx(k)
            val out = new Array[Double](idx.length)
            var i = 0
            while (i < idx.length) {
              val w = rp.wdeg(idx(i))
              out(i) = if (w > 0) rk(idx(i)) / w else 0.0
              i += 1
            }
            (rp.sendBlocks(k), (rp.rp, out))
          }
        }
      }.partitionBy(idB)
      val contribs = st.blockStates.zipPartitions(shares) { (bIt, sIt) =>
        if (!bIt.hasNext) { sIt.foreach(_ => ()); Iterator.empty }
        else {
          val bs = bIt.next()
          val b = bs.block
          val share = new Array[Double](b.nvtxs)
          // scatter incoming share arrays (disjoint positions — order-free)
          val gpos = new java.util.HashMap[Integer, Integer]()
          bs.gatherRps.indices.foreach(k => gpos.put(bs.gatherRps(k), k))
          sIt.foreach { case (_, (rp, arr)) =>
            val k = gpos.get(rp)
            if (k != null) {
              val idx = bs.gatherIdx(k)
              var i = 0
              while (i < idx.length) { share(idx(i)) = arr(i); i += 1 }
            }
          }
          // CSR kernel: accumulate into the block-local dst dictionary
          val wgtsI = bs.wgtsI
          val acc = new Array[Double](b.dstVids.length)
          var i = 0
          while (i < b.nvtxs) {
            val s = share(i)
            if (s != 0.0) {
              var j = b.xadj(i)
              while (j < b.xadj(i + 1)) {
                acc(b.adjLocal(j)) += s * wgtsI(j)
                j += 1
              }
            }
            i += 1
          }
          bs.scatterRps.indices.iterator.map { k =>
            val idx = bs.scatterIdx(k)
            val out = new Array[Double](idx.length)
            var q = 0
            while (q < idx.length) { out(q) = acc(idx(q)); q += 1 }
            (bs.scatterRps(k), (b.blockId, out))
          }
        }
      }.partitionBy(idR)
      ranks = st.rpStates.zipPartitions(contribs) { (rpIt, cIt) =>
        if (!rpIt.hasNext) { cIt.foreach(_ => ()); Iterator.empty }
        else {
          val rp = rpIt.next()
          val contrib = new Array[Double](rp.vids.length)
          // merge in blockId order — deterministic double sums regardless
          // of shuffle fetch order
          val rows = cIt.toArray.sortBy(_._2._1)
          val rpos = new java.util.HashMap[Integer, Integer]()
          rp.recvBlocks.indices.foreach(k => rpos.put(rp.recvBlocks(k), k))
          rows.foreach { case (_, (bId, arr)) =>
            val k = rpos.get(bId)
            if (k != null) {
              val idx = rp.recvIdx(k)
              var i = 0
              while (i < idx.length) { contrib(idx(i)) += arr(i); i += 1 }
            }
          }
          val rk = new Array[Double](rp.vids.length)
          var i = 0
          while (i < rk.length) { rk(i) = base + damping * contrib(i); i += 1 }
          Iterator((rp.rp, rk))
        }
      }
    }
    ranks
  }

  /** (vid, rank) DataFrame over the CONNECTED vertex set (wdeg keys) —
    * same contract as the loop body of [[Csr.iterate]]; join `vertices`
    * with a (1-d)/n default to cover islands, as [[Csr.iterate]] does.
    */
  def toRanksDf(spark: SparkSession, st: FastState,
                ranks: RDD[(Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    st.rpStates.zipPartitions(ranks) { (rpIt, rkIt) =>
      if (!rpIt.hasNext) Iterator.empty
      else {
        val rp = rpIt.next()
        val rk = rkIt.next()._2
        rp.vids.indices.iterator.map(i => (rp.vids(i), rk(i)))
      }
    }.toDF("vid", "rank")
  }

  /** Full pipeline: blocks → `iters` fast iterations → (vid, rank) rows. */
  def pageRank(spark: SparkSession, blocks: Dataset[Csr.Block],
               vertices: DataFrame, damping: Double = 0.85, iters: Int = 10,
               numParts: Int = 64): DataFrame = {
    val st = prepare(spark, blocks, vertices, numParts)
    val n = st.n
    val ranks = toRanksDf(spark, st, iterate(st, damping, iters))
      .ckpt()
    st.unpersistAll()
    vertices.select(col("vid")).distinct()
      .join(ranks, Seq("vid"), "left")
      .select(col("vid"),
        coalesce(col("rank"), lit((1 - damping) / n)).as("rank"))
  }
}
