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
  *
  * All hashing is pure integer arithmetic (polynomial rolling hashes under
  * Mersenne-prime-sized moduli) rather than xxhash64, for two reasons:
  * (1) every intermediate stays < 2^62, so the arithmetic can't overflow
  * int64 (Spark 4 runs ANSI mode); (2) the identical function is
  * expressible in ANSI SQL, so the whole sketch pipeline — signatures,
  * bands, candidate pairs — is verified value-for-value by the DuckDB
  * oracle ([[minhashPairsOracleSql]], [[simhashOracleSql]],
  * [[simhashPairsOracleSql]]).
  */
object NearDup {

  // Mersenne prime 2^31-1 and a second prime just below it: a·x + b with
  // a,b,x < P stays under 2^62 — ANSI-safe.
  private val P = 2147483647L
  private val P2 = 2147483629L

  /** SQL text (Spark dialect) of the char-level polynomial rolling hash of
    * string expression `s`: fold (acc·base + codepoint) mod `mod`.
    * Lambda vars are prefixed to avoid capturing an outer lambda's `i`.
    */
  private def charHashSpark(s: String, base: Long, mod: Long): String =
    s"""aggregate(transform(sequence(1, greatest(1, length($s))),
       |    ch_i -> CAST(ascii(substring($s, ch_i, 1)) AS BIGINT)),
       |  CAST(0 AS BIGINT), (ch_a, ch_c) -> (ch_a * $base + ch_c) % $mod)"""
      .stripMargin

  /** Same hash in DuckDB dialect. */
  private def charHashDuck(s: String, base: Long, mod: Long): String =
    s"""LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),
       |    LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(1, LENGTH($s))),
       |      ch_i -> CAST(ASCII(SUBSTR($s, CAST(ch_i AS INT), 1)) AS BIGINT))),
       |  (ch_a, ch_c) -> (ch_a * $base + ch_c) % $mod)""".stripMargin

  // word-combining bases for the shingle hash: acc·base + wordHash stays
  // < 2^31·2^18 + 2^31 < 2^50 (ANSI-safe) under both moduli
  private val WB1 = 8191L
  private val WB2 = 131071L

  /** Distinct word-`n`-gram shingle hashes per doc: 62-bit packed pair of
    * two INDEPENDENT hashes — each WORD is rolling-hashed once (bases
    * 31/131, moduli P/P2 over its chars), then each shingle combines its
    * `n` word hashes with a second polynomial (bases 8191/131071) and the
    * two 31-bit results pack as `c31 + c131·2^31`. A single 31-bit hash
    * hits birthday collisions around ~65k distinct shingles (any real
    * corpus); the packed pair pushes that to ~2^31 while every value stays
    * < 2^62 (ANSI-safe) and DuckDB-replicable.
    *
    * Hash-words-then-combine matters for speed, not just style: hashing
    * the space-joined gram string re-evaluated the `array_join(slice(...))`
    * expression PER CHARACTER inside the interpreted higher-order fold —
    * O(len²) string builds per shingle, ~40 s for 5k docs at sf0.1. Each
    * word hashed once + n multiply-adds per shingle is ~20x faster.
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the hash kernel runs as a typed mapPartitions, NOT a column pipeline:
    // Spark's higher-order functions (transform/aggregate lambdas) are
    // INTERPRETED per element — the same fold as plain Scala arithmetic is
    // ~10x faster, and the values are identical by construction (the SQL
    // spelling below in [[shinglesSql]]/the oracle is the spec)
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (docId, text) =>
          if (text == null) Iterator.empty // SQL explode(null array) emits 0 rows
          else {
          // split(text, ' ') keeps trailing empties (Spark limit -1)
          val words = text.split(" ", -1)
          val wh1 = words.map(charHash(_, 31, P))
          val wh2 = words.map(charHash(_, 131, P2))
          val nSh = math.max(1, words.length - (n - 1))
          val out = new java.util.LinkedHashSet[Long]()
          var i = 0
          while (i < nSh) {
            // slice(wh, i+1, n) truncates at the array end
            val end = math.min(i + n, words.length)
            var c1 = 0L; var c2 = 0L
            var j = i
            while (j < end) {
              c1 = (c1 * WB1 + wh1(j)) % P
              c2 = (c2 * WB2 + wh2(j)) % P2
              j += 1
            }
            out.add(c1 + c2 * (1L << 31))
            i += 1
          }
          val ids = new Array[(Long, Long)](out.size)
          val itOut = out.iterator()
          var k = 0
          while (itOut.hasNext) { ids(k) = (docId, itOut.next()); k += 1 }
          ids.iterator
          }
        }
      }
      .toDF("doc_id", "sh")
  }

  /** Scala twin of [[charHashSpark]]: fold (acc·base + codepoint) mod
    * `mod` over the string's code points; the SQL form's
    * `sequence(1, greatest(1, length(s)))` makes the empty string hash 0
    * (one step with `ascii('') = 0`).
    */
  private def charHash(s: String, base: Long, mod: Long): Long = {
    if (s == null || s.isEmpty) return 0L
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  private def hashParams62(numHashes: Int, seed: Long): (Array[Long], Array[Long], Array[Long]) = {
    val rng = new scala.util.Random(seed)
    val a1 = Array.fill(numHashes)(math.abs(rng.nextLong()) % (P - 1) + 1)
    val a2 = Array.fill(numHashes)(math.abs(rng.nextLong()) % (P - 1) + 1)
    val bs = Array.fill(numHashes)(math.abs(rng.nextLong()) % P)
    require(a1.forall(a => a > 0 && a < P) && a2.forall(a => a > 0 && a < P)
      && bs.forall(b => b >= 0 && b < P))
    (a1, a2, bs)
  }

  /** MinHash signature: `numHashes` hash functions over the packed 62-bit
    * shingle x = (lo, hi): h_i(x) = ((a_i·lo) mod P + (a'_i·hi) mod P + b_i)
    * mod P — each product < 2^62 (ANSI-safe), collision ~1/P per function.
    * One hash-aggregate pass of `numHashes` scalar `min` columns —
    * identical values to (and 5x faster than) the previous
    * collect_list+fold, which materialized every shingle's 64-hash array
    * per doc (~0.5 MB/doc) inside the aggregation buffer.
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 64,
                        n: Int = 3, seed: Long = 42L): DataFrame = {
    val (a1, a2, bs) = hashParams62(numHashes, seed)
    val lo = col("sh").bitwiseAND(lit((1L << 31) - 1))
    val hi = shiftright(col("sh"), 31)
    val mins = (0 until numHashes).map { i =>
      min(pmod(pmod(lo * lit(a1(i)), lit(P)) + pmod(hi * lit(a2(i)), lit(P))
        + lit(bs(i)), lit(P))).as(s"m$i")
    }
    shingles(docs, n)
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("signature"))
  }

  /** LSH candidate pairs: split signatures into `bands` bands of
    * `numHashes/bands` rows; docs sharing any full band (exact value
    * equality, not just a hash bucket — keeps the result set identical to
    * the SQL oracle's) collide. Pairs are then scored with signature
    * agreement ≥ `minSim` (estimated Jaccard). The shuffle key is a hash of
    * the band content; the band arrays are compared exactly on top.
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
        col("col").as("arr"),
        xxhash64(col("pos"), col("col").cast("string")).as("bucket"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.arr") === col("b.arr") && col("a.doc_id") < col("b.doc_id"))
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

  /** DuckDB oracle for [[minhashLshPairs]]: identical signatures (same
    * seeded a/b parameters), all-pairs join restricted to pairs sharing at
    * least one full band — exactly the LSH candidate predicate, O(n²) only
    * in the oracle. Output matches (id1, id2, est_jaccard) value-for-value.
    */
  def minhashPairsOracleSql(numHashes: Int = 64, bands: Int = 16, n: Int = 3,
                            minSim: Double = 0.7, seed: Long = 42L): String = {
    val (a1, a2, bs) = hashParams62(numHashes, seed)
    val r = numHashes / bands
    val sigCols = (0 until numHashes).map(i =>
      s"MIN((((sh & ${(1L << 31) - 1}) * ${a1(i)}) % $P" +
        s" + ((sh >> 31) * ${a2(i)}) % $P + ${bs(i)}) % $P) AS h$i")
      .mkString(",\n    ")
    val bandEq = (0 until bands).map { b =>
      (0 until r).map(j => s"a.h${b * r + j} = b.h${b * r + j}")
        .mkString("(", " AND ", ")")
    }.mkString("\n      OR ")
    val matches = (0 until numHashes)
      .map(i => s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH ws AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
       |wh AS (SELECT doc_id,
       |    LIST_TRANSFORM(w, t -> ${charHashDuck("t", 31, P)}) AS wh1,
       |    LIST_TRANSFORM(w, t -> ${charHashDuck("t", 131, P2)}) AS wh2
       |  FROM ws),
       |sh0 AS (SELECT DISTINCT doc_id, UNNEST(LIST_TRANSFORM(
       |    GENERATE_SERIES(1, GREATEST(1, LEN(wh1) - ${n - 1})),
       |    sh_i -> LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),
       |              LIST_SLICE(wh1, sh_i, sh_i + ${n - 1})),
       |            (sh_a, sh_x) -> (sh_a * $WB1 + sh_x) % $P)
       |          + LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),
       |              LIST_SLICE(wh2, sh_i, sh_i + ${n - 1})),
       |            (sh_a, sh_x) -> (sh_a * $WB2 + sh_x) % $P2)
       |            * ${1L << 31})) AS sh
       |  FROM wh),
       |sig AS (SELECT doc_id,
       |    $sigCols
       |  FROM sh0 GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2,
       |         ROUND(CAST($matches AS DOUBLE) / $numHashes, 6) AS est_jaccard
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |  WHERE $bandEq)
       |SELECT id1, id2, est_jaccard FROM pairs
       |WHERE est_jaccard >= $minSim ORDER BY id1, id2""".stripMargin
  }

  /** 62-bit SimHash: sign-sum of per-token hash bits weighted by term
    * frequency; near-dups = pairs within `maxHamming`. The 62-bit token
    * hash is two independent rolling hashes packed as h1 | (h2 << 31)
    * (< 2^62, ANSI-safe). Banding on 4 16-bit blocks guarantees recall for
    * hamming ≤ 3 (pigeonhole), so [[simhashPairs]] returns EXACTLY the
    * all-pairs hamming ≤ 3 set — which is what the oracle computes.
    */
  val SimhashBits = 62

  private def tokenHashes62: Column = {
    val h1 = charHashSpark("t", 31, P)
    val h2 = charHashSpark("t", 131, P2)
    expr(s"transform(split(text, ' '), t -> $h1 + ($h2) * ${1L << 31})")
  }

  def simhash(docs: DataFrame): DataFrame = {
    val tokenH = docs.select(col("doc_id"), tokenHashes62.as("ths"))
    // bit b of simhash = 1 if sum over tokens of (bit set ? +1 : -1) > 0
    val bitCols = (0 until SimhashBits).map { b =>
      expr(s"""CASE WHEN aggregate(ths, 0,
              |  (acc, h) -> acc + CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0
              |THEN CAST(1 AS BIGINT) << $b ELSE CAST(0 AS BIGINT) END""".stripMargin)
    }
    tokenH.select(col("doc_id"),
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

  private def simhashDuckCte: String = {
    val h1 = charHashDuck("t", 31, P)
    val h2 = charHashDuck("t", 131, P2)
    val bitTerms = (0 until SimhashBits).map { b =>
      s"""CASE WHEN LIST_SUM(LIST_TRANSFORM(ths,
         |    h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |  THEN CAST(1 AS BIGINT) << $b ELSE CAST(0 AS BIGINT) END"""
        .stripMargin
    }.mkString(" |\n    ")
    s"""th AS (SELECT doc_id, LIST_TRANSFORM(STRING_SPLIT(text, ' '),
       |    t -> $h1 + ($h2) * ${1L << 31}) AS ths
       |  FROM documents),
       |sim AS (SELECT doc_id,
       |    $bitTerms AS simhash
       |  FROM th)""".stripMargin
  }

  /** DuckDB oracle for [[simhash]]. */
  def simhashOracleSql: String =
    s"""WITH $simhashDuckCte
       |SELECT doc_id, simhash FROM sim ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for [[simhashPairs]]: all-pairs hamming ≤ maxHamming —
    * identical to the blocked join by the pigeonhole recall guarantee.
    */
  def simhashPairsOracleSql(maxHamming: Int = 3): String =
    s"""WITH $simhashDuckCte
       |SELECT a.doc_id AS id1, b.doc_id AS id2,
       |       BIT_COUNT(XOR(a.simhash, b.simhash)) AS hamming
       |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |WHERE BIT_COUNT(XOR(a.simhash, b.simhash)) <= $maxHamming
       |ORDER BY id1, id2""".stripMargin
}
