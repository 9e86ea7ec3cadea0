package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark (driver contract: ONE JSON line on stdout).
  *
  * Sections:
  *   - `queries`: wall seconds per SparkEntry query on SPARK_GRAFT_SF_DIR
  *     at local[SPARK_GRAFT_CPUS];
  *   - `scaling`: the north-rule two-parallelism evidence — the identical
  *     PageRank job over a deterministically synthesized transcript graph at
  *     local[8] vs local[32], with throughput at both and the efficiency
  *     (target >= 0.8; see [[Scaling]]). Skippable via
  *     SPARK_GRAFT_SKIP_SCALING=1 for quick iteration.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    spark.stop()

    val scaling =
      if (sys.env.get("SPARK_GRAFT_SKIP_SCALING").contains("1")) "null"
      else {
        val nConv = sys.env.getOrElse("SPARK_GRAFT_SCALE_CONVS", "2000000").toLong
        val iters = sys.env.getOrElse("SPARK_GRAFT_SCALE_ITERS", "6").toInt
        try {
          val (lo, hi, eff) = Scaling.pair(nConv = nConv, iters = iters)
          Scaling.json(lo, hi, eff)
        } catch { case e: Throwable => s"""{"error":"${e.getMessage}"}""" }
      }

    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec",""" +
      s""""queries":$qs,"sf":"$sfDir","scaling":$scaling}""")
  }
}
