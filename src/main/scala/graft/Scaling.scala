package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Csr, EdgeDeriver}
import graft.sources.Transcripts

/** Two-cluster-size scaling evidence (north rule: throughput scaling
  * efficiency >= 0.8 from N to 4N executors; sandbox proxy per the driver:
  * the same job at local[N] and local[4N] on the same input).
  *
  * The measured job is the headline workload: PageRank power iterations over
  * the transcript-derived link graph. Input is synthesized deterministically
  * (seed 42) at a size where compute dominates scheduling overhead, derived
  * once per session, and only the PR iterations are timed.
  */
object Scaling {

  case class RunResult(cpus: Int, vertices: Long, edges: Long, iters: Int,
                       seconds: Double) {
    def itersPerSec: Double = iters / seconds
    /** edge-traversals/sec: 2|E| contribution flows per iteration */
    def teps: Double = 2.0 * edges * iters / seconds
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      // AQE stays ON: its runtime broadcast of the per-block rank arrays is
      // what keeps the CSR blocks from being re-shuffled every iteration
      // (measured 6x slower without it)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One measured run at `cpus` threads: synth -> derive -> build the
    * co-partitioned adjacency (all untimed prep), then time exactly `iters`
    * power iterations. The loop keeps both sides of the contribution join
    * hash-partitioned on the same key, so each iteration pays exactly one
    * shuffle (contributions by dst) — the irreducible communication of
    * distributed PR.
    */
  def run(cpus: Int, nConv: Long, iters: Int, warmupIters: Int = 2): RunResult = {
    val spark = session(cpus)
    try {
      val ts = Transcripts.synthesize(spark, nConv)
      val dict = EdgeDeriver.vertices(ts)
      // Plans.checkpoint, not raw localCheckpoint: the edges feed a Union
      // (Csr symmetrize) directly above the checkpointed LogicalRDD — the
      // Spark 4.1 stale-constraint crash shape (NOTES.md)
      val edges = graft.plans.Plans.checkpoint(
        EdgeDeriver.simpleGraph(EdgeDeriver.edges(ts, dict)))
      val nE = edges.count()
      // the headline operator: PR over edge-granular balanced CSR blocks —
      // hub adjacency split across blocks, so no straggler task (P15);
      // 4 blocks/core gives the scheduler room to pack
      val blocks = Csr.buildBalanced(spark, edges, numBlocks = cpus * 4)
      val st = Csr.prepare(spark, blocks, dict.select(col("vid")),
        numParts = cpus * 2)
      val nV = st.n
      // Csr.iterate keeps its default checkpointEvery=1 (eager per-iteration
      // materialization) — NOTES.md measured the all-lazy plan ~2x slower.
      // The action must consume the rank VALUES (a bare count() of the left
      // join would let Catalyst prune the whole computation).
      def force(df: org.apache.spark.sql.DataFrame): Double =
        df.agg(sum(col("rank"))).head().getDouble(0)
      force(Csr.iterate(spark, st, 0.85, warmupIters)) // JIT warmup
      // min over trials: the sandbox VM has intermittent noisy-neighbor CPU
      // stalls; the minimum approximates true machine capacity (standard
      // practice for contended-host benchmarking)
      val trials = sys.env.getOrElse("SPARK_GRAFT_SCALE_TRIALS", "3").toInt
      val sec = (1 to trials).map { t =>
        val t0 = System.nanoTime()
        force(Csr.iterate(spark, st, 0.85, iters))
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[scaling] cpus=$cpus trial=$t ${dt}%.2fs")
        dt
      }.min
      st.unpersistAll()
      RunResult(cpus, nV, nE, iters, sec)
    } finally spark.stop()
  }

  /** Run the pair (cpusLo, cpusHi=4x) IN ONE JVM and report efficiency =
    * (thrHi/thrLo) / (cpusHi/cpusLo). Quick-iteration only: NOTES.md
    * measured a second SparkSession in the same JVM up to 4x slower —
    * headline evidence must come from [[pairForked]].
    */
  def pair(cpusLo: Int = 8, cpusHi: Int = 32, nConv: Long = 400000L,
           iters: Int = 8): (RunResult, RunResult, Double) = {
    val lo = run(cpusLo, nConv, iters)
    val hi = run(cpusHi, nConv, iters)
    val eff = (lo.seconds / hi.seconds) / (cpusHi.toDouble / cpusLo)
    (lo, hi, eff)
  }

  /** One measured run in a FRESH JVM (the clean-measurement path): spawn
    * `java -cp <this classpath> graft.Scaling` with
    * SPARK_GRAFT_SCALE_CPUS set, inherit this JVM's flags (add-opens, heap),
    * parse the single-run JSON line. Each parallelism level gets its own
    * heap/JIT — the in-JVM pair() contaminated the second run by up to 4x.
    */
  def runForked(cpus: Int, nConv: Long, iters: Int): RunResult = {
    import scala.jdk.CollectionConverters._
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", sys.props("java.class.path"), "graft.Scaling")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_SCALE_CPUS", cpus.toString)
    pb.environment().put("SPARK_GRAFT_SCALE_CONVS", nConv.toString)
    pb.environment().put("SPARK_GRAFT_SCALE_ITERS", iters.toString)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val rc = p.waitFor()
    require(rc == 0, s"forked scaling run (cpus=$cpus) exited $rc: $out")
    def field(k: String): String =
      s""""$k":([0-9.]+)""".r.findFirstMatchIn(out)
        .getOrElse(sys.error(s"no $k in forked output: $out")).group(1)
    RunResult(cpus, field("vertices").toLong, field("edges").toLong,
      field("pr_iters").toInt, field("seconds").toDouble)
  }

  /** The headline two-parallelism evidence: both levels in fresh JVMs. */
  def pairForked(cpusLo: Int = 8, cpusHi: Int = 32, nConv: Long,
                 iters: Int): (RunResult, RunResult, Double) = {
    val lo = runForked(cpusLo, nConv, iters)
    val hi = runForked(cpusHi, nConv, iters)
    val eff = (lo.seconds / hi.seconds) / (cpusHi.toDouble / cpusLo)
    (lo, hi, eff)
  }

  def json(lo: RunResult, hi: RunResult, eff: Double): String =
    s"""{"cpus_lo":${lo.cpus},"cpus_hi":${hi.cpus},""" +
      s""""vertices":${lo.vertices},"edges":${lo.edges},"pr_iters":${lo.iters},""" +
      s""""sec_lo":${f"${lo.seconds}%.2f"},"sec_hi":${f"${hi.seconds}%.2f"},""" +
      s""""iters_per_sec_lo":${f"${lo.itersPerSec}%.3f"},""" +
      s""""iters_per_sec_hi":${f"${hi.itersPerSec}%.3f"},""" +
      s""""teps_lo":${f"${lo.teps}%.0f"},"teps_hi":${f"${hi.teps}%.0f"},""" +
      s""""scaling_efficiency":${f"$eff%.3f"}}"""

  def main(args: Array[String]): Unit = {
    val nConv = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "2000000").toLong
    val iters = sys.env.getOrElse("SPARK_GRAFT_SCALE_ITERS", "6").toInt
    sys.env.get("SPARK_GRAFT_SCALE_CPUS") match {
      case Some(c) => // single-run mode (one parallelism level per JVM)
        val r = run(c.toInt, nConv, iters)
        println(s"""{"cpus":${r.cpus},"vertices":${r.vertices},""" +
          s""""edges":${r.edges},"pr_iters":${r.iters},""" +
          s""""seconds":${f"${r.seconds}%.2f"},""" +
          s""""iters_per_sec":${f"${r.itersPerSec}%.3f"}}""")
      case None =>
        val (lo, hi, eff) = pair(nConv = nConv, iters = iters)
        println(json(lo, hi, eff))
    }
  }
}
