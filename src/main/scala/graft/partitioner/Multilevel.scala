package graft.partitioner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.GraphOps
import graft.plans.Checkpointer

/** The multilevel k-way partitioner V-cycle re-expressed as iterative
  * DataFrame joins (north rule item 3; reference S_par_partition_mlevel,
  * src/partition.c:197-310):
  *
  *   coarsen:  [matching (M1 SHEM→handshake joins) → contraction (A1
  *             groupBy)] until nvtxs ≤ coarsenTo or shrink ratio >
  *             stopRatio (P6, partition.c:216-223, ctrl.c:57,260);
  *   init:     collect coarsest to the driver, best-of-8 greedy growing
  *             (P10, initpart.c:30-77);
  *   uncoarsen: per level, projection join through cmap (J4,
  *             S_project_kway src/project.c:35-230) then bulk-synchronous
  *             greedy boundary refinement (R1).
  *
  * Every level's cmap + assignment is checkpointed (the durable analogue of
  * the reference's out-of-core level dumps, src/asyncio.c) so the V-cycle
  * is resumable; cut/imbalance metrics are recorded per level.
  */
object Multilevel {

  case class Level(edges: DataFrame, vertices: DataFrame, cmap: DataFrame,
                   nvtxs: Long)

  case class PartitionResult(assign: DataFrame, cut: Long, imbalance: Double,
                             levels: Int)

  def partition(spark: SparkSession, edges0: DataFrame, vertices0: DataFrame,
                k: Int, ubFactor: Double = 1.03, coarsenTo0: Int = 0,
                stopRatio: Double = 0.85, seed: Long = 42L,
                ckpt: Option[Checkpointer] = None): PartitionResult = {
    val coarsenTo = if (coarsenTo0 > 0) coarsenTo0 else math.max(30 * k, 200)
    var edges = edges0.select(col("src"), col("dst"), col("wgt"))
      .localCheckpoint(true)
    var vertices = vertices0.select(col("vid"), col("vwgt"))
      .localCheckpoint(true)
    var nvtxs = vertices.count()
    val tvwgt = vertices.agg(sum(col("vwgt"))).head().getLong(0)
    // P7 matching weight cap: 1.5 * (tvwgt / coarsenTo + 2)
    // (reference src/coarsen.c:78-88)
    val maxVwgt = (1.5 * (tvwgt.toDouble / coarsenTo + 2)).toLong

    var levels = List.empty[Level] // finest first
    var shrinking = true
    while (nvtxs > coarsenTo && shrinking) {
      val cmap = Matching.cmap(edges, vertices, maxVwgt)
      val (ce, cv) = Contraction.contract(edges, vertices, cmap)
      val cEdges = ce.localCheckpoint(true)
      val cVerts = cv.localCheckpoint(true)
      val cn = cVerts.count()
      ckpt.foreach(c => c.write(s"mlevel_cmap_l${levels.size}", 0, cmap))
      shrinking = cn.toDouble / nvtxs <= stopRatio
      if (cn < nvtxs) {
        levels = Level(edges, vertices, cmap, nvtxs) :: levels
        edges = cEdges; vertices = cVerts; nvtxs = cn
      } else shrinking = false
    }

    // initial partition on the coarsest graph, driver-side best-of-8
    // sorted: collect() row order is shuffle-fetch-order dependent, and the
    // serial solver's BFS visits neighbors in adjacency insertion order —
    // unsorted input would make the result run-dependent
    val eArr = edges.select(col("src"), col("dst"), col("wgt")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    val vArr = vertices.select(col("vid"), col("vwgt")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val g = InitialPartition.fromEdges(eArr, vArr)
    val where0 = InitialPartition.partition(g, k, ubFactor, 8, seed)
    var assign = spark.createDataFrame(
      g.vids.zip(where0).toSeq.map { case (v, p) => (v, p) }
    ).toDF("vid", "part").localCheckpoint(true)

    // uncoarsen: project + refine per level, finest last
    var levelIdx = levels.size
    assign = Refinement.refine(spark, edges, vertices, assign, k, ubFactor)
    for (lvl <- levels) {
      levelIdx -= 1
      // J4 projection join: fine inherits coarse part through cmap
      val projected = lvl.cmap
        .join(assign.withColumnRenamed("vid", "coarse"), "coarse")
        .select(col("vid"), col("part"))
        .localCheckpoint(true)
      assign = Refinement.refine(spark, lvl.edges, lvl.vertices, projected,
        k, ubFactor)
      ckpt.foreach(c => c.write(s"mlevel_assign_l$levelIdx", 0, assign,
        GraphOps.edgeCut(lvl.edges, assign).toDouble))
    }

    val finestEdges = if (levels.nonEmpty) levels.last.edges else edges
    val finestVerts = if (levels.nonEmpty) levels.last.vertices else vertices
    val cut = GraphOps.edgeCut(finestEdges, assign)
    val imb = GraphOps.imbalance(assign, finestVerts, k)
    PartitionResult(assign, cut, imb, levels.size)
  }
}
