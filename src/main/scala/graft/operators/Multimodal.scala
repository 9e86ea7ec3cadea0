package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column handling for a training-data pipeline: media payloads
  * ride as opaque BINARY columns with typed metadata, and every transform
  * is either pure column algebra (metadata extraction, byte-range frame
  * sampling — codegen, oracle-checkable) or a batched `mapPartitions` pass
  * (the decode/feature path — the Spark shape of a Pandas-UDF/mapInPandas
  * stage: one partition in, an iterator of typed rows out).
  *
  * The actual image/audio decode is STUBBED ([[decodeStub]]): this
  * container ships no codec libraries, so the stub derives a deterministic
  * fake feature vector from the payload bytes. The Spark-side plumbing —
  * binary schema, per-partition batching, fixed feature shape, metadata
  * passthrough — is the real, tested part; swapping the stub body for a
  * JNI/codec call changes nothing structurally.
  */
object Multimodal {

  /** Typed media row for the batched decode path. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded-feature row: fixed-shape embedding + pass-through metadata. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           features: Array[Float])

  /** Adapt `documents` into a media table: payload = UTF-8 bytes of the
    * text (a deterministic opaque blob), media_type round-robins over the
    * three modalities. This mirrors ingesting raw media bytes alongside a
    * key — the payload is never interpreted as text downstream.
    */
  def mediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Typed metadata from the payload — pure column algebra over the binary
    * column (the "parse the container header" stage; here the header is
    * synthesized from the byte length, so it is deterministic and
    * SQL-replicable).
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("media_type"),
      length(col("payload")).cast("bigint").as("n_bytes"))
      .withColumn("width", (pmod(col("n_bytes"), lit(640L)) + 16).cast("bigint"))
      .withColumn("height", (pmod(col("n_bytes"), lit(480L)) + 16).cast("bigint"))

  /** Frame sampling over video payloads: the payload is cut into
    * `frameBytes`-byte frames and every `every`-th frame is kept, each
    * fingerprinted with md5. At scale each row expands to
    * n_bytes/frameBytes/every rows; the explode is the only data growth.
    *
    * Frames are sliced through the payload's hex view (2 chars per byte,
    * byte-exact, no line chunking — Spark 4's base64 is MIME-chunked, hex
    * is the binary-slicing dialect Spark and the DuckDB oracle share).
    */
  def frameSample(media: DataFrame, frameBytes: Int = 66,
                  every: Int = 4): DataFrame = {
    val hexPerFrame = frameBytes * 2
    val nFrames = ceil(length(col("payload")).cast("double") / frameBytes)
      .cast("int")
    media.filter(col("media_type") === "video")
      // empty payloads have no frames: Spark's sequence(0, -1) would yield
      // the DESCENDING [0, -1] and emit a phantom frame 0, while the
      // oracle's GENERATE_SERIES(0, -1) is empty
      .filter(length(col("payload")) > 0)
      .withColumn("hx", upper(hex(col("payload"))))
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), nFrames - 1),
          i => i % every === 0)))
      .select(col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"),
        md5(col("hx").substr(col("frame_idx") * hexPerFrame + 1,
          lit(hexPerFrame))).as("frame_md5"))
  }

  /** The batched decode stage — mapPartitions over the typed Dataset, the
    * exact shape a real decoder plugs into (one executor-side batch per
    * partition, fixed-width float features out).
    *
    * STUB: no codec libraries exist in this environment, so "decoding"
    * derives `dim` deterministic pseudo-features by folding the payload
    * bytes (seeded per lane). Replace the fold with the real
    * decode+embed call; everything around it stays.
    */
  def decodeStub(spark: SparkSession, media: DataFrame,
                 dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[MediaRow]
      .mapPartitions { batch =>
        batch.map { m =>
          val f = new Array[Float](dim)
          var lane = 0
          while (lane < dim) {
            var acc = 1469598103934665603L ^ (lane * 1099511628211L)
            var i = 0
            while (i < m.payload.length) {
              acc = (acc ^ (m.payload(i) & 0xffL)) * 1099511628211L
              i += 1
            }
            // map to [-1, 1) deterministically
            f(lane) = ((acc >>> 11).toDouble / (1L << 53).toDouble * 2 - 1).toFloat
            lane += 1
          }
          MediaFeatures(m.doc_id, m.media_type, m.payload.length, f)
        }
      }
  }
}
