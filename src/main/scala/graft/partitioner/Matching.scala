package graft.partitioner

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Heavy-edge matching as iterative DataFrame joins — the Spark
  * re-expression of the reference's SHEM coarsening
  * (S_coarsen_match_SHEM, reference src/aggregate.c:1326-1593):
  *
  *   - every unmatched vertex proposes across its heaviest eligible edge
  *     (eligible = other endpoint unmatched, combined vertex weight under
  *     `maxVwgt` — the P7 cap, src/coarsen.c:78-88);
  *   - the reference's degree-ascending visit order becomes the proposal
  *     tie-break (prefer low-degree partners, then low vid — deterministic
  *     where the reference is race-dependent, SURVEY §7(a));
  *   - the shared-memory mutual-match cleanup (S_cleanup_match,
  *     src/aggregate.c:282-392) becomes the J2 handshake self-join: a
  *     proposal survives only if it is reciprocated;
  *   - after `rounds` proposal rounds, still-unmatched vertices self-match
  *     (match_SHEM's fallback, src/aggregate.c:1582-1588).
  *
  * Output: cmap(vid, coarse) where coarse = min(vid, partner) — the fine→
  * coarse lineage join key (reference `cmap[t]`, src/graph.h:67).
  */
object Matching {

  def cmap(edges: DataFrame, vertices: DataFrame, maxVwgt: Long,
           rounds: Int = 2): DataFrame = {
    val deg = GraphOps.degrees(edges).select(col("vid"), col("deg"))
    val vw = vertices.select(col("vid"), col("vwgt"))
    var unmatched = vw.join(deg, Seq("vid"), "left")
      .select(col("vid"), col("vwgt"), coalesce(col("deg"), lit(0L)).as("deg"))
      .persist()
    // typed empty seed (a zero-column emptyDataFrame + withColumn trips
    // Catalyst's Union constraint rewrite in Spark 4)
    var pairs = unmatched.sparkSession
      .createDataFrame(Seq.empty[(Long, Long)]).toDF("u", "v")
    val sym = GraphOps.symmetrize(edges).persist()

    for (_ <- 1 to rounds) {
      val um = unmatched.select(col("vid"), col("vwgt"), col("deg"))
      // eligible edges: both endpoints unmatched, weight cap respected
      val elig = sym
        .join(um.select(col("vid").as("src"), col("vwgt").as("sw")), "src")
        .join(um.select(col("vid").as("dst"), col("vwgt").as("dw"),
          col("deg").as("ddeg")), "dst")
        .filter(col("sw") + col("dw") <= maxVwgt)
      // heaviest edge wins; ties to lower partner degree then lower vid
      // (max of struct(wgt, -deg, -vid))
      val prop = elig
        .groupBy(col("src").as("u"))
        .agg(max(struct(col("wgt"), (-col("ddeg")).as("nd"),
          (-col("dst")).as("nv"))).as("best"))
        .select(col("u"), (-col("best.nv")).as("partner"))
      // J2 handshake: keep mutual proposals only
      val mutual = prop.as("a")
        .join(prop.as("b"),
          col("a.partner") === col("b.u") && col("b.partner") === col("a.u"))
        .filter(col("a.u") < col("a.partner"))
        .select(col("a.u").as("u"), col("a.partner").as("v"))
      pairs = graft.plans.Plans.checkpoint(pairs.unionByName(mutual))
      val matchedVids = pairs.select(col("u").as("vid"))
        .unionByName(pairs.select(col("v").as("vid")))
      val nextUnmatched = unmatched.join(matchedVids, Seq("vid"), "left_anti")
        .persist()
      nextUnmatched.count()
      unmatched.unpersist()
      unmatched = nextUnmatched
    }
    val matchedMap = pairs.select(col("u").as("vid"), col("u").as("coarse"))
      .unionByName(pairs.select(col("v").as("vid"), col("u").as("coarse")))
    val selfMap = unmatched.select(col("vid"), col("vid").as("coarse"))
    val out = graft.plans.Plans.checkpoint(matchedMap.unionByName(selfMap))
    sym.unpersist(); unmatched.unpersist()
    out
  }
}
