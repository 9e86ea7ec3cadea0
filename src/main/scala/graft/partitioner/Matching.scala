package graft.partitioner

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Matching for coarsening as iterative DataFrame joins — the Spark
  * re-expression of the reference's matching schemes
  * (par_aggregate_graph, reference src/aggregate.c:2018-2135):
  *
  *   - SHEM (sorted heavy-edge matching, the default ctype src/ctrl.c:49;
  *     S_coarsen_match_SHEM src/aggregate.c:1326-1593): every unmatched
  *     vertex proposes across its heaviest eligible edge; the reference's
  *     degree-ascending visit order becomes the proposal tie-break (prefer
  *     low-degree partners, then low vid — deterministic where the
  *     reference is race-dependent, SURVEY §7(a));
  *   - RM (random matching, S_coarsen_match_RM src/aggregate.c:1133-1311):
  *     same skeleton, pseudo-random eligible neighbor — the rank is a
  *     seeded hash of the edge, so it is deterministic and
  *     partitioning-independent;
  *   - eligibility = other endpoint unmatched AND combined vertex weight
  *     under `caps` for EVERY constraint (the P7 cap per constraint,
  *     src/coarsen.c:78-88);
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

  sealed trait Scheme
  case object SHEM extends Scheme
  case object RM extends Scheme

  /** Scalar-weight entry point: vertices(vid, vwgt), single cap. */
  def cmap(edges: DataFrame, vertices: DataFrame, maxVwgt: Long,
           rounds: Int = 2): DataFrame =
    cmapMC(edges, vertices.select(col("vid"), array(col("vwgt")).as("vwgts")),
      Array(maxVwgt), rounds)

  /** Multi-constraint entry point: vertices(vid, vwgts array<bigint>),
    * one cap per constraint.
    */
  def cmapMC(edges: DataFrame, vertices: DataFrame, caps: Array[Long],
             rounds: Int = 2, scheme: Scheme = SHEM,
             seed: Long = 42L): DataFrame = {
    val ncon = caps.length
    val deg = GraphOps.degrees(edges).select(col("vid"), col("deg"))
    val vw = vertices.select(col("vid"), col("vwgts"))
    var unmatched = vw.join(deg, Seq("vid"), "left")
      .select(col("vid"), col("vwgts"), coalesce(col("deg"), lit(0L)).as("deg"))
      .persist()
    // typed empty seed (a zero-column emptyDataFrame + withColumn trips
    // Catalyst's Union constraint rewrite in Spark 4)
    var pairs = unmatched.sparkSession
      .createDataFrame(Seq.empty[(Long, Long)]).toDF("u", "v")
    val sym = GraphOps.symmetrize(edges).persist()

    // eligibility: combined weight under the cap for EVERY constraint (P7)
    def capOk: Column = (0 until ncon).map { c =>
      element_at(col("sw"), c + 1) + element_at(col("dw"), c + 1) <= caps(c)
    }.reduce(_ && _)

    for (_ <- 1 to rounds) {
      val um = unmatched.select(col("vid"), col("vwgts"), col("deg"))
      val elig = sym
        .join(um.select(col("vid").as("src"), col("vwgts").as("sw")), "src")
        .join(um.select(col("vid").as("dst"), col("vwgts").as("dw"),
          col("deg").as("ddeg")), "dst")
        .filter(capOk)
      // proposal rank: SHEM = heaviest edge, ties to lower partner degree
      // then lower vid; RM = seeded-hash shuffle (deterministic random)
      val rank = scheme match {
        case SHEM => struct(col("wgt"), (-col("ddeg")).as("nd"),
          (-col("dst")).as("nv"))
        // edge-symmetric hash (least/greatest) so both endpoints rank the
        // shared edge identically — locally-max-hash edges handshake
        case RM => struct(xxhash64(least(col("src"), col("dst")),
            greatest(col("src"), col("dst")), lit(seed)).as("r"),
          lit(0L).as("nd"), (-col("dst")).as("nv"))
      }
      val prop = elig
        .groupBy(col("src").as("u"))
        .agg(max(rank).as("best"))
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
