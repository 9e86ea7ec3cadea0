package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.operators.{Csr, CsrFast, EdgeDeriver}
import graft.sources.Transcripts

/** Temporary stage-level profiler for the scaling kernel. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("P_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.serializer",
        sys.env.getOrElse("P_SER", "org.apache.spark.serializer.KryoSerializer"))
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("P_BYPASS", "0"))
      .config("spark.local.dir", sys.env.getOrElse("P_LOCALDIR", "/dev/shm/graft-scaling"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (si.completionTime.get - si.submissionTime.get) / 1e3
        val runS = m.executorRunTime / 1e3
        val cpuS = m.executorCpuTime / 1e9
        val gcS = m.jvmGCTime / 1e3
        val deserS = m.executorDeserializeTime / 1e3
        val swTimeS = m.shuffleWriteMetrics.writeTime / 1e9
        val swMB = m.shuffleWriteMetrics.bytesWritten / 1e6
        val srWaitS = m.shuffleReadMetrics.fetchWaitTime / 1e3
        val srMB = (m.shuffleReadMetrics.localBytesRead +
          m.shuffleReadMetrics.remoteBytesRead) / 1e6
        if (wall > 0.15)
          System.err.println(f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"wall=${wall}%6.2fs run=${runS}%7.1fs cpu=${cpuS}%7.1fs " +
            f"gc=${gcS}%5.1fs deser=${deserS}%5.1fs " +
            f"swT=${swTimeS}%5.1fs swMB=${swMB}%7.0f srWait=${srWaitS}%5.1fs " +
            f"srMB=${srMB}%7.0f " + si.name.take(60))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val nConv = sys.env.getOrElse("P_CONVS", "2000000").toLong
    val maxTurns = sys.env.getOrElse("P_TURNS", "150").toInt
    val ts = Transcripts.synthesize(spark, nConv, maxTurns = maxTurns)
    val dict = EdgeDeriver.vertices(ts)
    val edges = graft.plans.Plans.checkpoint(
      EdgeDeriver.simpleGraph(EdgeDeriver.edges(ts, dict)))
    edges.count()
    val nBlocks = sys.env.getOrElse("P_BLOCKS", "128").toInt
    val nParts = sys.env.getOrElse("P_PARTS", "64").toInt
    val blocks = Csr.buildBalanced(spark, edges, numBlocks = nBlocks)
    val st = CsrFast.prepare(spark, blocks, dict.select(col("vid")), numParts = nParts)
    System.gc(); Thread.sleep(2000)
    def force(r: org.apache.spark.rdd.RDD[(Int, Array[Double])]): Double =
      r.map(_._2.sum).sum()
    System.err.println("[scratch] ===== prep done, 2 warmup iters =====")
    force(CsrFast.iterate(st, 0.85, 2))
    System.err.println("[scratch] ===== timed: 6 iterations =====")
    val t0 = System.nanoTime()
    force(CsrFast.iterate(st, 0.85, 6))
    System.err.println(f"[scratch] 6 iters ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
