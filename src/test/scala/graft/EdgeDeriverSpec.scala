package graft

import org.apache.spark.sql.functions._
import graft.operators.EdgeDeriver
import graft.sources.Transcripts

/** The north-rule derivation layer: deterministic synth fixtures, per-turn
  * text equality under stable turn ordering (BASELINE.json input_hint),
  * order-independence of the derivation, dictionary density, hub capping.
  */
class EdgeDeriverSpec extends SparkSpec {

  private lazy val ts = Transcripts.synthesize(spark, nConv = 300).persist()

  test("synthesize is deterministic and partitioning-independent") {
    val a = Transcripts.synthesize(spark, 200).orderBy("conv_id", "turn_idx")
      .collect().toSeq
    val b = Transcripts.synthesize(spark, 200).repartition(13)
      .orderBy("conv_id", "turn_idx").collect().toSeq
    assert(a == b)
  }

  test("turn_idx is dense and unique per conversation (stable turn ordering)") {
    val bad = ts.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n"), countDistinct(col("turn_idx")).as("nd"),
        min(col("turn_idx")).as("mn"), max(col("turn_idx")).as("mx"))
      .filter(col("n") =!= col("nd") || col("mn") =!= 0 ||
        col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)
  }

  test("per-turn text equality vs source under stable turn ordering") {
    // text must be the deterministic function of (conv_id, turn_idx) the
    // generator promises — recompute and anti-join (north-rule invariant)
    val recomputed = ts.select(col("conv_id"), col("turn_idx"),
      concat(lit("t:"), col("conv_id"), lit(":"), col("turn_idx"), lit(":"),
        xxhash64(col("conv_id"), col("turn_idx"), lit(42L))).as("text2"))
    val mismatch = ts.join(recomputed, Seq("conv_id", "turn_idx"))
      .filter(col("text") =!= col("text2"))
    assert(mismatch.count() == 0)
  }

  test("vertex dictionary: dense unique ids 0..n-1, stable across partitioning") {
    val v = EdgeDeriver.vertices(ts)
    val ids = v.select(col("vid")).collect().map(_.getLong(0)).sorted
    assert(ids.head == 0L && ids.last == ids.length - 1L)
    assert(ids.distinct.length == ids.length)
    val v2 = EdgeDeriver.vertices(ts.repartition(17))
      .orderBy("vid").collect().toSeq
    assert(v.orderBy("vid").collect().toSeq == v2)
  }

  test("derived edges: canonical, no self-loops, positive weights") {
    val verts = EdgeDeriver.vertices(ts)
    val e = EdgeDeriver.edges(ts, verts).persist()
    assert(e.filter(col("src") >= col("dst")).count() == 0)
    assert(e.filter(col("wgt") <= 0).count() == 0)
    // all endpoints resolve to dictionary ids
    val n = verts.count()
    assert(e.filter(col("src") >= n || col("dst") >= n || col("src") < 0).count() == 0)
    // derivation is order-independent
    val e2 = EdgeDeriver.edges(ts.repartition(11), verts)
    assert(e.orderBy("src", "dst", "etype").collect().toSeq ==
      e2.orderBy("src", "dst", "etype").collect().toSeq)
    e.unpersist()
  }

  test("turn adjacency on a hand-built conversation") {
    // conv A: tools x,y,x in turns 0,2,4 -> edges (x,y)x2; conv B: single tool
    val rows = Seq(
      ("A", 0, "tool", "t", "x"), ("A", 1, "user", "t", null),
      ("A", 2, "tool", "t", "y"), ("A", 3, "user", "t", null),
      ("A", 4, "tool", "t", "x"), ("B", 0, "tool", "t", "z"))
    val df = spark.createDataFrame(rows)
      .toDF("conv_id", "turn_idx", "role", "text", "tool")
      .withColumn("ts", current_timestamp())
    val got = EdgeDeriver.turnAdjacency(df)
      .select(col("src_key"), col("dst_key"), col("wgt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("x", "y", 2L)))
  }

  test("shared-tool: small tools form cliques, hub tools a path (P15 cap)") {
    // tool "small" used by 3 convs -> C(3,2)=3 edges;
    // tool "hub" used by 6 convs with cap 4 -> path of 5 edges
    val rows =
      (1 to 3).map(i => (f"c$i%02d", 0, "tool", "t", "small")) ++
        (1 to 6).map(i => (f"h$i%02d", 0, "tool", "t", "hub"))
    val df = spark.createDataFrame(rows)
      .toDF("conv_id", "turn_idx", "role", "text", "tool")
      .withColumn("ts", current_timestamp())
    val cfg = EdgeDeriver.Config(hubCap = 4)
    val got = EdgeDeriver.sharedTool(df, cfg)
      .select(col("src_key"), col("dst_key")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val cliquePart = Set(("c01", "c02"), ("c01", "c03"), ("c02", "c03"))
    val pathPart = (1 to 5).map(i => (f"h$i%02d", f"h${i + 1}%02d")).toSet
    assert(got == cliquePart ++ pathPart)
    // hub report is not silent
    val hubs = EdgeDeriver.hubStats(df, cfg).collect()
    assert(hubs.length == 1 && hubs.head.getString(0) == "hub")
    assert(hubs.head.getAs[Long]("clique_edges") == 15L)
    assert(hubs.head.getAs[Long]("kept_edges") == 5L)
  }

  test("zipf tool distribution produces hubs above the default cap") {
    val stats = EdgeDeriver.hubStats(ts, EdgeDeriver.Config(hubCap = 64))
    assert(stats.count() >= 1, "synthesizer must produce power-law hub tools")
  }
}
