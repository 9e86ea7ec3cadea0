package graft.partitioner

import graft.plans.Plans.CheckpointOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recursive-bisection k-way partitioning — the reference's second public
  * API (MTMETIS_PartGraphRecursive, reference src/mtmetis.c:362-391; the
  * serial path runs vendored METIS with rb=1, src/imetis.c:268-324).
  *
  * Each step bisects with PROPORTIONAL target fractions (⌈k/2⌉ : ⌊k/2⌋ —
  * so odd k stays balanced; the reference passes tpwgts the same way),
  * extracts the two halves as semi-joins (J6, par_graph_extract_halves
  * src/graph.c:2936-3630: both endpoints of a surviving edge must lie in
  * the half), and recurses. Part ids are assigned depth-first: the left
  * subtree owns [offset, offset+⌈k/2⌉), the right the rest — matching the
  * reference's label composition (src/mtmetis.c:55-67).
  */
object Recursive {

  def partition(spark: SparkSession, edges: DataFrame, vertices: DataFrame,
                k: Int, ubFactor: Double = 1.03, seed: Long = 42L,
                coarsenTo0: Int = 0): DataFrame = {
    val verts = vertices.select(col("vid"), col("vwgt")).ckpt()
    val es = edges.select(col("src"), col("dst"), col("wgt"))
      .ckpt()
    rec(spark, es, verts, k, ubFactor, seed, coarsenTo0, offset = 0)
      .ckpt()
  }

  private def rec(spark: SparkSession, edges: DataFrame, verts: DataFrame,
                  k: Int, ub: Double, seed: Long, coarsenTo0: Int,
                  offset: Int): DataFrame = {
    if (k <= 1)
      return verts.select(col("vid"), lit(offset).cast("int").as("part"))
    val k1 = (k + 1) / 2
    val k2 = k - k1
    val r = Multilevel.partitionMC(spark, edges,
      verts.select(col("vid"), array(col("vwgt")).as("vwgts")),
      2, ncon = 1, ubFactor = ub, coarsenTo0 = coarsenTo0, seed = seed,
      targets = Array(k1.toDouble / k, k2.toDouble / k))
    val a = r.assign.ckpt()
    // J6 halves extraction: vertices of the side, edges with BOTH endpoints
    // inside (two semi-joins)
    def half(side: Int): (DataFrame, DataFrame) = {
      val vs = verts.join(a.filter(col("part") === side).select(col("vid")),
        "vid").ckpt()
      val es = edges
        .join(vs.select(col("vid").as("src")), Seq("src"), "left_semi")
        .join(vs.select(col("vid").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"), col("wgt")).ckpt()
      (vs, es)
    }
    val (v0, e0) = half(0)
    val (v1, e1) = half(1)
    rec(spark, e0, v0, k1, ub, seed * 31 + 1, coarsenTo0, offset)
      .unionByName(
        rec(spark, e1, v1, k2, ub, seed * 31 + 2, coarsenTo0, offset + k1))
  }
}
