package graft.plans

import org.apache.spark.sql.DataFrame

/** Plan-hygiene helpers. */
object Plans {

  /** Eager localCheckpoint that materializes with constraint propagation
    * disabled. Spark 4.1's `LogicalRDD.rewriteStatsAndConstraints` rewrites
    * the checkpointed plan's constraints with `getOrElse(attr, attr)` — any
    * constraint attribute that is not in the plan's output survives stale,
    * and the next Union above the checkpoint throws
    * `NoSuchElementException: key not found` from
    * `UnionBase.rewriteConstraints` (observed on iterated
    * union→checkpoint→union chains, e.g. matching rounds). Materializing
    * with propagation off stores an empty constraint set on the LogicalRDD;
    * downstream plans re-derive what they need.
    */
  def checkpoint(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val key = "spark.sql.constraintPropagation.enabled"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try df.localCheckpoint(eager = true)
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
