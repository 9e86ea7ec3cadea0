package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for a large-scale training-data pipeline over
  * the `documents(doc_id, text, lang, source, n_chars)` table: exact
  * dedup, token counting, quality scoring, n-gram Jaccard near-dup,
  * language-ID heuristic, rolling-hash fingerprinting.
  *
  * All are single-pass groupBy/join compositions — no UDFs in the hot path
  * (higher-order `functions` stay inside whole-stage codegen). The O(n²)
  * candidate spaces (Jaccard) are keyed by shared shingles, never a cross
  * join, so they scale with shingle-bucket sizes, not corpus².
  */
object TextOps {

  /** Exact duplicate groups by full-text equality: one row per distinct
    * text with its canonical (min) doc_id and multiplicity. md5 keys the
    * group portably (same function in DuckDB).
    */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))

  /** Whitespace token stats per document. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars"),
      size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
      .withColumn("avg_token_len",
        round((col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"), 6))

  /** Quality score: token count, mean token length, stopword ratio,
    * distinct-token ratio — the classic cheap pretraining-quality signals.
    */
  def qualityScore(docs: DataFrame, stopwords: Seq[String] =
      Seq("the", "a", "of", "and", "to", "in")): DataFrame = {
    val toks = split(col("text"), " ")
    val stopArr = array(stopwords.map(lit): _*)
    docs.select(col("doc_id"),
      size(toks).cast("bigint").as("n_tokens"),
      size(array_intersect(toks, stopArr)).cast("bigint").as("n_stop_kinds"),
      (size(toks) - size(array_distinct(toks))).cast("bigint").as("n_repeats"))
      .withColumn("repeat_ratio",
        round(col("n_repeats").cast("double") / col("n_tokens"), 6))
  }

  /** Distinct character `n`-grams per doc (the inverted-index rows). */
  private def ngramRows(docs: DataFrame, n: Int): DataFrame =
    docs.selectExpr("doc_id",
      s"""explode(array_distinct(filter(
         |  transform(sequence(1, greatest(1, length(text) - ${n - 1})),
         |            i -> substring(text, i, $n)),
         |  x -> length(x) = $n))) AS gram""".stripMargin)

  /** Grams above the document-frequency cap (the "stop-grams"). Tiny by
    * construction (few grams can touch > maxDf docs), so always
    * broadcastable.
    */
  private def hotGrams(g: DataFrame, maxDf: Int): DataFrame =
    g.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)

  /** Character n-gram Jaccard near-duplicate pairs: distinct `n`-grams per
    * doc, inverted-index join on shared grams, |A∩B| from match counts,
    * Jaccard = ∩ / (|A|+|B|−∩) ≥ `minSim` — computed over the
    * *informative* gram space: grams whose document frequency exceeds
    * `maxDf` are dropped first (standard stop-gram cut). A gram appearing
    * in df docs contributes df² candidate pairs, so without the cut one
    * stop-gram ("the", " a ") makes the join quadratic in corpus size; with
    * it, candidate work is bounded by |grams|·maxDf². The cut is reported,
    * never silent — see [[ngramDfStats]].
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, minSim: Double = 0.5,
                        maxDf: Int = 128): DataFrame = {
    val g0 = ngramRows(docs, n)
    val g = g0.join(broadcast(hotGrams(g0, maxDf).select(col("gram"))),
      Seq("gram"), "left_anti")
    val sizes = g.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = g.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("id1"), col("sz").as("sz1")), "id1")
      .join(sizes.select(col("doc_id").as("id2"), col("sz").as("sz2")), "id2")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sz1") + col("sz2") - col("inter")), 6))
      .filter(col("jaccard") >= minSim)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Audit of the [[ngramJaccardPairs]] stop-gram cut (mirrors
    * EdgeDeriver.hubStats — truncation is reported, never silent): one row
    * per dropped gram with its document frequency and the candidate pairs
    * the cut avoided.
    */
  def ngramDfStats(docs: DataFrame, n: Int = 3, maxDf: Int = 128): DataFrame =
    hotGrams(ngramRows(docs, n), maxDf)
      .select(col("gram"), col("df"),
        (col("df") * (col("df") - 1) / 2).cast("bigint").as("pairs_cut"))

  /** Language-ID heuristic: score = count of language-marker stopword hits;
    * argmax with deterministic tie-break (marker-count desc, lang asc).
    * Real pipelines use fastText; the Spark plumbing (per-doc classify with
    * broadcast profiles) is identical.
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langId(docs: DataFrame): DataFrame = {
    // typed mapPartitions kernel (the NearDup.shingles pattern; the SQL
    // spelling in the oracle is the spec): the former column pipeline
    // inlined `split(lower(text))` into one array_intersect PER LANGUAGE —
    // Catalyst re-evaluated the tokenize 5x per row and the query cost
    // 31 s at sf0.1. Tokenizing once per row into a hash set and counting
    // marker membership computes the identical distinct-hit scores
    // (markers within a language are unique, so membership count =
    // |distinct(toks) ∩ markers|) with the same (hits, lang) struct-max
    // tie-break: argmax hits, lexicographically-LAST language on ties.
    val spark = docs.sparkSession
    import spark.implicits._
    val langs: Array[(String, Array[String])] = LangMarkers.toSeq
      .sortBy(_._1).map { case (l, ms) => (l, ms.toArray) }.toArray
    docs.select(col("doc_id").cast("long"), col("lang"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.map { case (id, labeled, text) =>
          val toks = new java.util.HashSet[String]()
          if (text != null) {
            // split(text, ' ') keeps trailing empties (limit -1), like SQL
            val ws = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
            var k = 0
            while (k < ws.length) { toks.add(ws(k)); k += 1 }
          }
          var bestHits = Int.MinValue; var bestLang: String = null
          var i = 0
          while (i < langs.length) {
            val lang = langs(i)._1; val ms = langs(i)._2
            var hits = 0; var j = 0
            while (j < ms.length) { if (toks.contains(ms(j))) hits += 1; j += 1 }
            if (hits > bestHits ||
                (hits == bestHits && lang.compareTo(bestLang) > 0)) {
              bestHits = hits; bestLang = lang
            }
            i += 1
          }
          (id, labeled, bestLang, bestHits)
        }
      }
      .toDF("doc_id", "labeled_lang", "predicted_lang", "score")
  }

  /** Polynomial rolling-hash document fingerprint (base 31, mod 2^31−1;
    * the small Mersenne modulus keeps every intermediate < 2^36, overflow-
    * free) — deterministic, computed with `aggregate` over the char codes
    * (stays in codegen; no UDF).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id",
      """aggregate(
        |  transform(sequence(1, length(text)), i -> ascii(substring(text, i, 1))),
        |  CAST(0 AS BIGINT),
        |  (acc, c) -> (acc * 31 + c) % CAST(2147483647 AS BIGINT)
        |) AS fp""".stripMargin)
}
