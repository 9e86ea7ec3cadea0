package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, NearDup, TextOps}

/** Training-data ops: dedup, quality, fingerprints, near-dup sketches, ANN.
  * (Value-level parity vs DuckDB runs in the driver's Verify gate; these
  * are the semantic unit tests.)
  */
class TextOpsSpec extends SparkSpec {

  private lazy val docs = spark.createDataFrame(Seq(
    (0L, "the cat sat on the mat", "en"),
    (1L, "the cat sat on the mat", "en"),   // exact dup of 0
    (2L, "the dog sat on the mat", "en"),   // near dup
    (3L, "der hund ist und die katze", "de"),
    (4L, "completely different words entirely unrelated", "en"),
    (5L, "the cat sat on the hat", "en")    // near dup
  )).toDF("doc_id", "text", "lang")

  test("exact dedup groups identical texts under the min doc_id") {
    val m = TextOps.dedupExact(docs).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(m(0L) == 2L, "docs 0 and 1 collapse to canonical 0")
    assert(m.values.sum == 6L && m.size == 5)
  }

  test("token stats and quality on a known sentence") {
    val r = TextOps.tokenStats(docs).filter(col("doc_id") === 0).head()
    assert(r.getLong(1) == 22L && r.getLong(2) == 6L) // chars, tokens
    val q = TextOps.qualityScore(docs).filter(col("doc_id") === 0).head()
    assert(q.getAs[Long]("n_tokens") == 6L)
    assert(q.getAs[Long]("n_repeats") == 1L) // "the" twice
  }

  test("ngram jaccard: identical pair scores 1.0, near-dups above 0.5") {
    val pairs = TextOps.ngramJaccardPairs(docs, 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 2L)) || pairs.contains((0L, 5L)))
    assert(!pairs.contains((0L, 4L)) && !pairs.contains((0L, 3L)))
  }

  test("minhash LSH finds exact dups with estimated jaccard 1.0") {
    val pairs = NearDup.minhashLshPairs(docs, 64, 16, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(!pairs.contains((0L, 4L)))
  }

  test("simhash: identical texts identical hashes; pairs at hamming 0") {
    val h = NearDup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0L) == h(1L))
    assert(h(0L) != h(4L))
    val pairs = NearDup.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((0L, 1L)) == 0)
  }

  test("rolling-hash fingerprint is the documented polynomial") {
    val one = spark.createDataFrame(Seq((0L, "ab", "en")))
      .toDF("doc_id", "text", "lang")
    val fp = TextOps.fingerprint(one).head().getLong(1)
    assert(fp == 97L * 31 + 98) // (0*31+'a')*31+'b'
  }

  test("langId predicts via marker stopwords") {
    val got = TextOps.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(0L) == "en" && got(3L) == "de")
  }

  private lazy val embeddings = {
    // 12 deterministic 5-dim vectors; 11 is an identical twin of 0
    val rnd = new scala.util.Random(7)
    val base = (0 until 12).map(_ => Array.fill(5)(rnd.nextDouble()))
    val rows = base.indices.map(i =>
      (i.toLong, (if (i == 11) base(0) else base(i)).toSeq))
    spark.createDataFrame(rows).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("brute-force ANN: a twin vector is its own top neighbor at cosine 1.0") {
    val top = Ann.bruteForceTopK(embeddings, k = 3, nQueries = 1)
      .filter(col("rnk") === 1).head()
    assert(top.getAs[Long]("neighbor") == 11L)
    assert(top.getAs[Double]("cosine") == 1.0)
  }

  test("LSH ANN finds the twin (same-bucket guarantee for identical vectors)") {
    val top = Ann.lshTopK(embeddings, dim = 5, k = 3, nQueries = 1)
      .filter(col("rnk") === 1).head()
    assert(top.getAs[Long]("neighbor") == 11L)
  }

  test("IVF ANN finds the twin and returns k rows per query") {
    val res = Ann.ivfTopK(spark, embeddings, dim = 5, nLists = 4, nprobe = 2,
      k = 3, nQueries = 2).collect()
    assert(res.count(_.getAs[Long]("qid") == 0L) == 3)
    val top0 = res.find(r => r.getAs[Long]("qid") == 0L && r.getAs[Long]("rnk") == 1L).get
    assert(top0.getAs[Long]("neighbor") == 11L)
  }

  test("embedding-cosine near-dup pairs: twin found, threshold respected") {
    // vec 11 duplicates vec 0 (see `embeddings`): identical sign pattern →
    // same bucket in EVERY table, cosine 1.0
    val pairs = Ann.cosinePairs(embeddings, dim = 5, tau = 0.99,
      bits = 3, tables = 2).collect()
    assert(pairs.exists(r =>
      r.getAs[Long]("a") == 0L && r.getAs[Long]("b") == 11L &&
        r.getAs[Double]("cosine") == 1.0), s"twin missing: ${pairs.toSeq}")
    // every emitted pair honors the threshold and a < b
    val all = Ann.cosinePairs(embeddings, dim = 5, tau = 0.5,
      bits = 3, tables = 2).collect()
    assert(all.forall(_.getAs[Double]("cosine") >= 0.5))
    assert(all.forall(r => r.getAs[Long]("a") < r.getAs[Long]("b")))
    assert(all.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).distinct.length
      == all.length, "no duplicate pairs across tables")
  }
}
