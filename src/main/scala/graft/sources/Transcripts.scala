package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic transcript fixtures + adapters onto the mandated input shape
  * `(conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp)` (BASELINE.json input_hint).
  *
  * Two producers:
  *   - [[synthesize]] — pure-column generator over `spark.range`, seed-stable
  *     and order-independent (same rows at any parallelism). Zipf-ish tool
  *     popularity produces the power-law hubs the salted/capped shared-tool
  *     derivation must handle (FIXTURES.md §1).
  *   - [[fromEvents]] — adapter from the driver's `events` parquet table so
  *     the DuckDB oracle can check the same derivation SQL-for-SQL.
  *
  * The reference engine reads graphs from METIS/SNAP/CSR files
  * (wildriver/src/MetisFile.cpp, SNAPFile.cpp); here the "scan" is a columnar
  * parquet/Iceberg read and the graph is *derived* from transcripts (north
  * rule) — see [[graft.operators.EdgeDeriver]].
  */
object Transcripts {

  val NumTools = 997 // prime, tool_0000..tool_0996, Zipf-ish popularity

  /** Deterministic synthetic transcripts: `nConv` conversations, 1..maxTurns
    * turns each. Every column is a pure function of (conv ordinal, turn_idx,
    * seed) so generation is reproducible and independent of partitioning.
    */
  def synthesize(spark: SparkSession, nConv: Long, maxTurns: Int = 24,
                 seed: Long = 42L): DataFrame = {
    val conv = spark.range(nConv).toDF("c")
      // deterministic per-conversation turn count in [1, maxTurns]
      .withColumn("n_turns",
        (pmod(xxhash64(col("c"), lit(seed), lit("nturns")), lit(maxTurns.toLong)) + 1).cast("int"))
    conv
      .select(col("c"), explode(sequence(lit(0), col("n_turns") - 1)).as("turn_idx"))
      .withColumn("conv_id", format_string("conv_%08d", col("c")))
      .withColumn("role",
        element_at(array(lit("user"), lit("assistant"), lit("tool")),
          (col("turn_idx") % 3 + 1).cast("int")))
      // log-uniform rank over [1, NumTools] => pmf ~ 1/rank (Zipf s~1):
      // u in [0,1), rank = floor(NumTools^u)
      .withColumn("u",
        pmod(xxhash64(col("c"), col("turn_idx"), lit(seed), lit("tool")), lit(1000000000L))
          .cast("double") / 1e9)
      .withColumn("tool",
        when(col("role") === "tool",
          format_string("tool_%04d",
            floor(pow(lit(NumTools.toDouble), col("u"))).cast("long") - 1))
          .otherwise(lit(null).cast("string")))
      .withColumn("text",
        concat(lit("t:"), col("conv_id"), lit(":"), col("turn_idx"), lit(":"),
          xxhash64(col("conv_id"), col("turn_idx"), lit(seed))))
      .withColumn("ts",
        timestamp_seconds(lit(1704067200L) + col("c") * 100 + col("turn_idx")))
      .select(col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        col("role"), col("text"), col("tool"), col("ts"))
  }

  /** Adapt the driver's `events` table (event_id, ts, user_id, event_type,
    * value, props) into the transcript shape: one conversation per user,
    * turns ordered by (ts, event_id) — a stable total order so `turn_idx`
    * is deterministic. `tool` = event_type, `text` = props.
    * Mirrors what a production ingest of agent logs into the mandated
    * Iceberg schema looks like; DuckDB-replicable for the oracle.
    */
  def fromEvents(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("turn_idx", (row_number().over(w) - 1).cast("int"))
      .select(
        format_string("conv_%08d", col("user_id")).as("conv_id"),
        col("turn_idx"),
        col("event_type").as("role"),
        col("props").as("text"),
        col("event_type").as("tool"),
        col("ts"))
  }

  /** DuckDB SQL equivalent of [[fromEvents]] (for oracle_sql.json). */
  val fromEventsSql: String =
    """SELECT format('conv_{:08d}', user_id) AS conv_id,
      |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
      |       event_type AS role, props AS text, event_type AS tool, ts
      |FROM events""".stripMargin
}
