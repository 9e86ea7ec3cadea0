package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at scale: MinHash+LSH and SimHash over
  * `documents.text`. Both are expressed as higher-order-function column
  * pipelines (codegen-friendly, no Scala UDFs) + banded groupBy joins —
  * the standard shingle → sketch → band-bucket → candidate-join shape that
  * scales to 100 TB because no stage is quadratic in the corpus: work is
  * bounded by bucket collision sizes, and hot buckets are just skewed keys
  * that AQE skew-join splitting handles.
  */
object NearDup {

  // Mersenne modulus 2^31-1: a·x + b with a,b,x < P stays under 2^62, so
  // the hash arithmetic can't overflow int64 (Spark 4 runs ANSI mode)
  private val P = 2147483647L

  /** Distinct word-`n`-gram shingle hashes per doc (xxhash64 of the joined
    * shingle, made non-negative).
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.selectExpr("doc_id",
        s"""explode(array_distinct(transform(
           |  sequence(1, greatest(1, size(split(text, ' ')) - ${n - 1})),
           |  i -> abs(xxhash64(array_join(slice(split(text, ' '), i, $n), ' ')))
           |))) AS sh""".stripMargin)

  /** MinHash signature: `numHashes` permutations h_i(x) = (a_i·x + b_i)
    * mod p, minimum over the doc's shingle set. One aggregate pass:
    * signature(i) = min over shingles of h_i — computed as an array-typed
    * groupBy aggregate (zip_with of running minima).
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 64,
                        n: Int = 3, seed: Long = 42L): DataFrame = {
    val rng = new scala.util.Random(seed)
    val as = Array.fill(numHashes)(math.abs(rng.nextLong()) % (P - 1) + 1)
    val bs = Array.fill(numHashes)(math.abs(rng.nextLong()) % P)
    val hashArr = array((0 until numHashes).map { i =>
      pmod(col("sh") % P * lit(as(i)) + lit(bs(i)), lit(P))
    }: _*)
    require(as.forall(a => a > 0 && a < P) && bs.forall(b => b >= 0 && b < P))
    shingles(docs, n)
      .select(col("doc_id"), hashArr.as("hs"))
      .groupBy(col("doc_id"))
      .agg(aggregate(collect_list(col("hs")),
        array((0 until numHashes).map(_ => lit(Long.MaxValue)): _*),
        (acc, x) => zip_with(acc, x, (a, b) => least(a, b))).as("signature"))
  }

  /** LSH candidate pairs: split signatures into `bands` bands of
    * `numHashes/bands` rows; docs sharing any full band collide. Pairs are
    * then verified with exact signature similarity ≥ `minSim` (estimated
    * Jaccard). Bucket key = hash(band index, band slice).
    */
  def minhashLshPairs(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
                      n: Int = 3, minSim: Double = 0.7,
                      seed: Long = 42L): DataFrame = {
    val r = numHashes / bands
    val sigs = minhashSignatures(docs, numHashes, n, seed).persist()
    val banded = sigs.select(col("doc_id"), col("signature"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => slice(col("signature"), b * r + 1, lit(r)))))
      .select(col("doc_id"), col("signature"), col("pos").as("band"),
        xxhash64(col("band"), col("col").cast("string")).as("bucket"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.signature").as("s1"), col("b.signature").as("s2"))
      .distinct()
    val out = cand
      .withColumn("est_jaccard", round(
        size(filter(zip_with(col("s1"), col("s2"), (x, y) =>
          when(x === y, 1).otherwise(0)), v => v === 1)).cast("double")
          / numHashes, 6))
      .filter(col("est_jaccard") >= minSim)
      .select(col("id1"), col("id2"), col("est_jaccard"))
    out
  }

  /** 64-bit SimHash: sign-sum of per-token hash bits weighted by term
    * frequency; near-dups = pairs within `maxHamming`. Banding on 4 16-bit
    * blocks guarantees recall for hamming ≤ 3 (pigeonhole).
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tokenHashes = docs.selectExpr("doc_id",
      "transform(split(text, ' '), t -> xxhash64(t)) AS ths")
    // bit b of simhash = 1 if sum over tokens of (bit set ? +1 : -1) > 0
    val bitCols = (0 until 64).map { b =>
      expr(s"""CASE WHEN aggregate(ths, 0,
              |  (acc, h) -> acc + CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0
              |THEN CAST(1 AS BIGINT) << $b ELSE CAST(0 AS BIGINT) END""".stripMargin)
    }
    tokenHashes.select(col("doc_id"),
      bitCols.reduce(_.bitwiseOR(_)).as("simhash"))
  }

  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs).persist()
    val blocked = sh.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(i =>
          shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .select(col("doc_id"), col("simhash"), col("pos").as("block"), col("col").as("key"))
    blocked.as("a").join(blocked.as("b"),
        col("a.block") === col("b.block") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.simhash").as("h1"), col("b.simhash").as("h2"))
      .distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }
}
