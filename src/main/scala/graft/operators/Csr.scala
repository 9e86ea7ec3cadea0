package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** CSR-encoded Dataset partitions (north rule: analytics "over CSR-encoded
  * Dataset partitions"). One typed row per edge-balanced vid range holds the
  * compressed-sparse-row slice of the symmetrized adjacency — the Spark
  * re-expression of the reference's per-thread CSR slices
  * (`xadj[t]/adjncy[t]/adjwgt[t]`, reference src/graph.h:53-57) with
  * edge-balanced placement (S_par_distribute_blockcyclic,
  * src/graph.c:1369-1454 → [[GraphOps.edgeBalancedRanges]]).
  *
  * The per-iteration PageRank kernel over blocks does map-side partial
  * aggregation of contributions inside each block (a LongMap per dst) before
  * the one irreducible shuffle — the same partial/final split Spark's hash
  * aggregate does, but over the cache-friendly CSR arrays.
  */
object Csr {

  case class Block(blockId: Int, vids: Array[Long], xadj: Array[Int],
                   adjncy: Array[Long], wgts: Array[Long]) {
    def nvtxs: Int = vids.length
    def nedges: Int = adjncy.length
  }

  /** Build CSR blocks from canonical undirected edges under edge-balanced
    * range boundaries: range+sort shuffle, then a single `mapPartitions`
    * pass builds each contiguous src run (SURVEY §1.4).
    */
  def build(spark: SparkSession, edges: DataFrame,
            bounds: Array[Long]): Dataset[Block] = {
    import spark.implicits._
    val sym = GraphOps.symmetrize(edges)
      .withColumn("blockId", GraphOps.rangeIdFor(col("src"), bounds))
    val n = bounds.length
    sym.repartition(n, col("blockId"))
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
          out += Block(curBlock, vids.toArray, xadj, adjncy.toArray, wgts.toArray)
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

  /** PageRank power iteration over CSR blocks: per iteration, rank chunks
    * are grouped by blockId and joined to their block (small shuffle —
    * O(V) rows), the kernel emits block-local partially-summed
    * contributions, and one groupBy(dst) completes the sum.
    */
  def pageRank(spark: SparkSession, blocks: Dataset[Block], vertices: DataFrame,
               damping: Double = 0.85, iters: Int = 10,
               numParts: Int = 32): DataFrame = {
    import spark.implicits._
    val verts = vertices.select(col("vid")).distinct().persist()
    val n = verts.count()
    val blocksP = blocks.persist(); blocksP.count()
    // weighted out-degree per vertex, computed once from the blocks
    val wdeg = blocksP.flatMap { b =>
      b.vids.indices.iterator.map { i =>
        var s = 0L
        var j = b.xadj(i)
        while (j < b.xadj(i + 1)) { s += b.wgts(j); j += 1 }
        (b.vids(i), s)
      }
    }.toDF("vid", "wdeg").persist()

    // vid → owning block lookup, computed once
    val vidBlock = blocksP
      .flatMap(b => b.vids.iterator.map(v => (v, b.blockId)))
      .toDF("vid", "blockId").persist()

    var ranks = verts.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      // group (vid, rank/wdeg) rows by their owning block
      val byBlock = vidBlock
        .join(ranks.join(wdeg, "vid"), "vid")
        .groupBy(col("blockId"))
        .agg(sort_array(collect_list(struct(col("vid"), (col("rank") / col("wdeg")).as("share")))).as("rs"))
      val contribs = blocksP
        .joinWith(byBlock, blocksP("blockId") === byBlock("blockId"))
        .flatMap { case (b, row) =>
          val rs = row.getSeq[org.apache.spark.sql.Row](1)
          val share = new mutable.LongMap[Double](rs.length * 2)
          rs.foreach(r => share(r.getLong(0)) = r.getDouble(1))
          val acc = new mutable.LongMap[Double](b.nedges / 4 + 16)
          var i = 0
          while (i < b.nvtxs) {
            val s = share.getOrElse(b.vids(i), 0.0)
            if (s != 0.0) {
              var j = b.xadj(i)
              while (j < b.xadj(i + 1)) {
                val d = b.adjncy(j)
                acc(d) = acc.getOrElse(d, 0.0) + s * b.wgts(j)
                j += 1
              }
            }
            i += 1
          }
          acc.iterator
        }.toDF("vid", "partial")
        .groupBy(col("vid")).agg(sum(col("partial")).as("contrib"))
      ranks = verts.join(contribs, Seq("vid"), "left")
        .select(col("vid"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    wdeg.unpersist(); vidBlock.unpersist(); blocksP.unpersist(); verts.unpersist()
    ranks
  }
}
