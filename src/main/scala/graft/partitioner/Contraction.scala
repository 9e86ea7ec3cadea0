package graft.partitioner

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph contraction — the central group-by of the multilevel pipeline
  * (reference A1, par_contract_graph src/contract.c:695-715). The
  * reference's three physical strategies (DENSE array / CLS hash / SORT
  * merge, contract.c:143-685) all compute the same relational statement,
  * which Spark's partial+final hash aggregate executes directly:
  *
  *   coarse edges  = edges ⋈ cmap(src) ⋈ cmap(dst)
  *                   |> filter(c_src ≠ c_dst)        -- drop internal edges
  *                   |> canonical (least/greatest)
  *                   |> groupBy(c_src, c_dst).sum(wgt)  -- weight conserved
  *   coarse vwgt   = vertices ⋈ cmap |> groupBy(coarse).sum(vwgt)
  *
  * Edge weight is conserved minus intra-cluster edges (tested invariant:
  * Σ coarse wgt + Σ dropped internal wgt = Σ fine wgt, mirroring the
  * reference's check_graph weight totals src/check.c:303-414).
  */
object Contraction {

  /** (coarse edges, coarse vertices) under cmap(vid, coarse). */
  def contract(edges: DataFrame, vertices: DataFrame,
               cmap: DataFrame): (DataFrame, DataFrame) = {
    val m = cmap.select(col("vid"), col("coarse"))
    val ce = edges
      .join(m.withColumnRenamed("vid", "src").withColumnRenamed("coarse", "cs"), "src")
      .join(m.withColumnRenamed("vid", "dst").withColumnRenamed("coarse", "cd"), "dst")
      .filter(col("cs") =!= col("cd"))
      .select(least(col("cs"), col("cd")).as("src"),
        greatest(col("cs"), col("cd")).as("dst"), col("wgt"))
      .groupBy(col("src"), col("dst")).agg(sum(col("wgt")).as("wgt"))
    val cv = vertices.join(m, "vid")
      .groupBy(col("coarse").as("vid")).agg(sum(col("vwgt")).as("vwgt"))
    (ce, cv)
  }

  /** Multi-constraint contraction: vertices(vid, vwgts array<bigint>) with
    * `ncon` entries — coarse vwgts are per-constraint sums (reference
    * contracts each of the ncon weights, src/contract.c:269).
    *
    * `nVerts` (caller-known |V|, -1 = unknown) lets the V-sized cmap ride
    * the [[graft.operators.GraphOps.dimSide]] broadcast against both
    * E-sized scans — contraction is then one edge scan plus the coarse
    * groupBy, no shuffle join of |E| rows against |V| rows.
    */
  def contractMC(edges: DataFrame, vertices: DataFrame, cmap: DataFrame,
                 ncon: Int, nVerts: Long = -1L): (DataFrame, DataFrame) = {
    val m = graft.operators.GraphOps.dimSide(
      cmap.select(col("vid"), col("coarse")), nVerts)
    val ce = edges
      .join(m.withColumnRenamed("vid", "src").withColumnRenamed("coarse", "cs"), "src")
      .join(m.withColumnRenamed("vid", "dst").withColumnRenamed("coarse", "cd"), "dst")
      .filter(col("cs") =!= col("cd"))
      .select(least(col("cs"), col("cd")).as("src"),
        greatest(col("cs"), col("cd")).as("dst"), col("wgt"))
      .groupBy(col("src"), col("dst")).agg(sum(col("wgt")).as("wgt"))
    val sums = (0 until ncon).map(c =>
      sum(element_at(col("vwgts"), c + 1)).as(s"w$c"))
    val cv = vertices.join(m, "vid")
      .groupBy(col("coarse").as("vid")).agg(sums.head, sums.tail: _*)
      .select(col("vid"),
        array((0 until ncon).map(c => col(s"w$c")): _*).as("vwgts"))
    (ce, cv)
  }
}
