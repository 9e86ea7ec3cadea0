package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{EdgeDeriver, PageRank}
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
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One measured run at `cpus` threads: synth -> derive (untimed) ->
    * `iters` PR iterations (timed).
    */
  def run(cpus: Int, nConv: Long, iters: Int, warmupIters: Int = 2): RunResult = {
    val spark = session(cpus)
    try {
      val ts = Transcripts.synthesize(spark, nConv)
      val dict = EdgeDeriver.vertices(ts)
      val edges = EdgeDeriver.simpleGraph(EdgeDeriver.edges(ts, dict))
        .localCheckpoint(true)
      val verts = dict.select(col("vid")).localCheckpoint(true)
      val nE = edges.count()
      val nV = verts.count()
      // JIT/codegen warmup outside the timer
      PageRank.fixedIterations(edges, verts, 0.85, warmupIters).count()
      val t0 = System.nanoTime()
      PageRank.fixedIterations(edges, verts, 0.85, iters).count()
      val sec = (System.nanoTime() - t0) / 1e9
      RunResult(cpus, nV, nE, iters, sec)
    } finally spark.stop()
  }

  /** Run the pair (cpusLo, cpusHi=4x) and report efficiency =
    * (thrHi/thrLo) / (cpusHi/cpusLo).
    */
  def pair(cpusLo: Int = 8, cpusHi: Int = 32, nConv: Long = 400000L,
           iters: Int = 8): (RunResult, RunResult, Double) = {
    val lo = run(cpusLo, nConv, iters)
    val hi = run(cpusHi, nConv, iters)
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
    val nConv = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "400000").toLong
    val iters = sys.env.getOrElse("SPARK_GRAFT_SCALE_ITERS", "8").toInt
    val (lo, hi, eff) = pair(nConv = nConv, iters = iters)
    println(json(lo, hi, eff))
  }
}
