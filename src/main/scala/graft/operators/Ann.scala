package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over `embeddings(vec_id, embedding array<float>,
  * label)`:
  *   - [[bruteForceTopK]] — exact cosine top-k, the correctness baseline.
  *     Dot products via `zip_with`+`aggregate` higher-order functions (no
  *     UDF). Quadratic: only for query subsets / oracles.
  *   - [[lshTopK]] — random-hyperplane LSH bucketing: candidates share a
  *     sign-pattern bucket in at least one of `tables` hash tables, exact
  *     re-rank inside buckets. The scale path: cost ∝ bucket sizes.
  *   - [[ivfTopK]] — IVF flavour: coarse centroids from a deterministic
  *     sample (driver k-means), probe `nprobe` nearest lists.
  */
object Ann {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Exact cosine top-k neighbors for the query set (default: all rows with
    * vid < nQueries). Rounded similarity + vec_id tie-break for determinism.
    */
  def bruteForceTopK(embeddings: DataFrame, k: Int = 5,
                     nQueries: Int = 10, roundTo: Int = 3): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val sims = q.join(e.filter(col("vec_id") >= lit(0)), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("qv"), col("embedding")) /
          (norm(col("qv")) * norm(col("embedding"))), roundTo).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("bigint").as("rnk"),
        col("vec_id").as("neighbor"), col("cosine"))
  }

  /** Seeded Gaussian hyperplanes, rounded to 4 decimals so the IDENTICAL
    * double constants can be embedded as literals in both the Spark plan
    * and the DuckDB oracle SQL (Double.toString round-trips).
    */
  private[operators] def lshPlanes(dim: Int, bits: Int, tables: Int,
                                   seed: Long): Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(math.rint(rng.nextGaussian() * 1e4) / 1e4)
  }

  /** Random-hyperplane LSH: `bits`-bit sign bucket per table; union of
    * per-table buckets forms the candidate set, re-ranked exactly. The
    * sign test rounds the dot product to 6 decimals first, so Spark and
    * the DuckDB oracle (same plane literals, same sequential double sums)
    * agree bit-for-bit on bucket membership.
    */
  def lshTopK(embeddings: DataFrame, dim: Int, k: Int = 5, nQueries: Int = 10,
              bits: Int = 8, tables: Int = 4, seed: Long = 42L,
              roundTo: Int = 3): DataFrame = {
    val planes = lshPlanes(dim, bits, tables, seed)
    def bucket(t: Int) = (0 until bits).map { b =>
      val plane = array(planes(t)(b).map(lit): _*)
      when(round(dot(col("embedding"), plane), 6) > 0, lit(1L << b))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val buckets = e.select(col("vec_id"), col("embedding"),
      posexplode(array((0 until tables).map(bucket): _*)))
      .select(col("vec_id"), col("embedding"), col("pos").as("table"),
        col("col").as("bucket"))
    val q = buckets.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("table"), col("bucket"))
    val cand = q.join(buckets, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qv"), col("vec_id"), col("embedding"))
      .distinct()
    val sims = cand.select(col("qid"), col("vec_id"),
      round(dot(col("qv"), col("embedding")) /
        (norm(col("qv")) * norm(col("embedding"))), roundTo).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("bigint").as("rnk"),
        col("vec_id").as("neighbor"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs — the embedding leg of the dedup
    * family (exact / MinHash / SimHash / n-gram Jaccard being the text
    * legs). Candidate generation is axis-sign LSH: table `t` hashes the
    * sign pattern of `bits` fixed dimensions (`(t*bits + j) % dim`), so two
    * vectors collide in table `t` iff they agree on all `bits` signs — a
    * deterministic, SQL-replicable member of the random-hyperplane family
    * (planes = coordinate axes; valid because the embedding distribution is
    * zero-centered per dimension). Candidates (same bucket in ≥1 table) are
    * exact-cosine re-ranked and thresholded at `tau`.
    *
    * Scale shape: never all-pairs — cost is Σ|bucket|² per table, bounded
    * by raising `bits` with corpus size (buckets = 2^bits per table).
    * Recall for a pair at angle θ is 1-(1-p^bits)^tables with
    * p = 1 - θ/π; raise `tables` for recall, `bits` for precision/cost.
    */
  def cosinePairs(embeddings: DataFrame, dim: Int, tau: Double,
                  bits: Int = 8, tables: Int = 4,
                  roundTo: Int = 3): DataFrame = {
    def bucket(t: Int) = (0 until bits).map { j =>
      val d = (t * bits + j) % dim
      when(element_at(col("embedding"), d + 1) > 0, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val buckets = e.select(col("vec_id"), col("embedding"),
      posexplode(array((0 until tables).map(bucket): _*)))
      .select(col("vec_id"), col("embedding"), col("pos").as("table"),
        col("col").as("bucket"))
    val a = buckets.select(col("table"), col("bucket"),
      col("vec_id").as("a"), col("embedding").as("va"))
    val b = buckets.select(col("table"), col("bucket"),
      col("vec_id").as("b"), col("embedding").as("vb"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("va"), col("vb"))
      .distinct() // a pair may collide in several tables
      .select(col("a"), col("b"),
        round(dot(col("va"), col("vb")) /
          (norm(col("va")) * norm(col("vb"))), roundTo).as("cosine"))
      .filter(col("cosine") >= tau)
  }

  /** DuckDB oracle for [[lshTopK]]: identical plane literals, identical
    * rounded-sign buckets, identical exact re-rank — value-for-value.
    */
  def lshOracleSql(dim: Int, k: Int = 5, nQueries: Int = 10, bits: Int = 8,
                   tables: Int = 4, seed: Long = 42L): String = {
    val planes = lshPlanes(dim, bits, tables, seed)
    def bucketExpr(t: Int): String = (0 until bits).map { b =>
      val lits = planes(t)(b).mkString("[", ", ", "]")
      s"(CASE WHEN ROUND(LIST_DOT_PRODUCT(v, $lits), 6) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    val bArms = (0 until tables).map(t =>
      s"SELECT vec_id, v, $t AS tbl, ${bucketExpr(t)} AS bucket FROM e")
      .mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (
       |  $bArms),
       |q AS (SELECT vec_id AS qid, tbl, bucket FROM b WHERE vec_id < $nQueries),
       |cand AS (SELECT DISTINCT q.qid, b.vec_id
       |         FROM q JOIN b ON q.tbl = b.tbl AND q.bucket = b.bucket
       |         WHERE b.vec_id <> q.qid),
       |sims AS (SELECT c.qid, c.vec_id,
       |                ROUND(LIST_COSINE_SIMILARITY(eq.v, eb.v), 3) AS cosine
       |         FROM cand c
       |         JOIN e eq ON eq.vec_id = c.qid
       |         JOIN e eb ON eb.vec_id = c.vec_id),
       |ranked AS (SELECT qid, vec_id, cosine,
       |                  ROW_NUMBER() OVER (PARTITION BY qid
       |                    ORDER BY cosine DESC, vec_id) AS rnk
       |           FROM sims)
       |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id AS neighbor, cosine
       |FROM ranked WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }

  // multiplier/modulus of the seeded-centroid selection hash (shared by
  // [[ivfTopKSeeded]] and its oracle; ANSI-safe: vec_id·a < 2^62)
  private val CentA = 1103515245L
  private val CentP = 2147483647L

  /** IVF with a SEEDED, SQL-replicable coarse quantizer: the `nLists`
    * centroids are the vectors minimizing (hash(vec_id), vec_id) — a
    * deterministic random selection (random-vector quantizers are the
    * textbook IVF baseline; [[ivfTopK]] keeps the k-means flavour). Every
    * stage — centroid choice, nearest-list assignment (squared distance via
    * the dot-product expansion ‖x‖²+‖c‖²−2x·c, identical double arithmetic
    * on both sides), `nprobe` probing, exact cosine re-rank — is replicated
    * value-for-value by [[ivfSeededOracleSql]].
    *
    * Scale shape: the quantizer is nLists rows by definition (top-k by
    * hash, no global sort); assignment is a broadcast cross join with
    * nLists centroids; probing touches nprobe/nLists of the corpus.
    */
  def ivfTopKSeeded(spark: SparkSession, embeddings: DataFrame, dim: Int,
                    nLists: Int = 16, nprobe: Int = 4, k: Int = 5,
                    nQueries: Int = 10, roundTo: Int = 3): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    val cent = e
      .withColumn("h", pmod((col("vec_id") + 1) * lit(CentA), lit(CentP)))
      .orderBy(col("h"), col("vec_id")).limit(nLists) // top-k, no global sort
      .collect() // nLists rows — the coarse quantizer is tiny by definition
    val centDf = spark.createDataFrame(
      cent.toIndexedSeq.zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Float](1).map(_.toDouble))
      }).toDF("list_id", "centroid")
    def sqd = round(
      dot(col("embedding"), col("embedding")) +
        dot(col("centroid"), col("centroid")) -
        lit(2.0) * dot(col("embedding"), col("centroid")), 6)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("list_id"))
    val assigned = e.crossJoin(broadcast(centDf))
      .withColumn("d", sqd)
      .withColumn("rn", row_number().over(wAssign)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("list_id"))
    val qProbe = e.filter(col("vec_id") < nQueries).crossJoin(broadcast(centDf))
      .withColumn("d", sqd)
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("list_id"))
    val sims = qProbe.join(assigned, "list_id")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("qv"), col("embedding")) /
          (norm(col("qv")) * norm(col("embedding"))), roundTo).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("bigint").as("rnk"),
        col("vec_id").as("neighbor"), col("cosine"))
  }

  /** DuckDB oracle for [[ivfTopKSeeded]]. */
  def ivfSeededOracleSql(nLists: Int = 16, nprobe: Int = 4, k: Int = 5,
                         nQueries: Int = 10): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (SELECT v AS cv,
       |           ROW_NUMBER() OVER (ORDER BY ((vec_id + 1) * $CentA) % $CentP,
       |             vec_id) - 1 AS list_id
       |         FROM e
       |         QUALIFY ROW_NUMBER() OVER (ORDER BY ((vec_id + 1) * $CentA) % $CentP,
       |           vec_id) <= $nLists),
       |dists AS (SELECT e.vec_id, e.v, cent.list_id,
       |                 ROUND(LIST_DOT_PRODUCT(e.v, e.v)
       |                   + LIST_DOT_PRODUCT(cent.cv, cent.cv)
       |                   - 2.0 * LIST_DOT_PRODUCT(e.v, cent.cv), 6) AS d
       |          FROM e CROSS JOIN cent),
       |ranked_d AS (SELECT vec_id, v, list_id, d,
       |                    ROW_NUMBER() OVER (PARTITION BY vec_id
       |                      ORDER BY d, list_id) AS rn
       |             FROM dists),
       |assigned AS (SELECT vec_id, v, list_id FROM ranked_d WHERE rn = 1),
       |probes AS (SELECT vec_id AS qid, v AS qv, list_id
       |           FROM ranked_d WHERE vec_id < $nQueries AND rn <= $nprobe),
       |sims AS (SELECT DISTINCT p.qid, a.vec_id,
       |                ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 3) AS cosine
       |         FROM probes p JOIN assigned a ON a.list_id = p.list_id
       |         WHERE a.vec_id <> p.qid),
       |ranked AS (SELECT qid, vec_id, cosine,
       |                  ROW_NUMBER() OVER (PARTITION BY qid
       |                    ORDER BY cosine DESC, vec_id) AS rnk
       |           FROM sims)
       |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id AS neighbor, cosine
       |FROM ranked WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin

  /** IVF: driver-side k-means on a deterministic sample (Lloyd, fixed
    * iterations, seeded init) → broadcast centroids → assign each vector to
    * its nearest list → queries probe the `nprobe` nearest lists, exact
    * re-rank inside.
    */
  def ivfTopK(spark: SparkSession, embeddings: DataFrame, dim: Int,
              nLists: Int = 16, nprobe: Int = 4, k: Int = 5,
              nQueries: Int = 10, sampleN: Int = 1000, seed: Long = 42L,
              roundTo: Int = 3): DataFrame = {
    // deterministic bounded sample WITHOUT a global sort of the full table:
    // a hash filter keeps ~1.2·sampleN rows (scales as a scan), and only
    // that small set is sorted for determinism
    val total = embeddings.count()
    val keepMod = 1000000L
    val keep = math.min(keepMod,
      math.ceil(math.min(1.0, sampleN * 1.2 / math.max(1L, total)) * keepMod).toLong)
    val sample = embeddings.select(col("vec_id"), col("embedding"))
      .filter(pmod(xxhash64(col("vec_id"), lit(seed)), lit(keepMod)) < keep)
      .orderBy(col("vec_id")).limit(sampleN)
      .collect().map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    val kk = math.min(nLists, sample.length)
    val rnd = new scala.util.Random(seed)
    var centroids = rnd.shuffle(sample.indices.toList).take(kk)
      .map(sample).toArray
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bd = Double.MaxValue
      for (c <- cs.indices) {
        var d = 0.0
        var i = 0
        while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
        if (d < bd) { bd = d; best = c }
      }
      best
    }
    for (_ <- 1 to 10) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val cnts = new Array[Int](kk)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        cnts(c) += 1
        for (i <- 0 until dim) sums(c)(i) += v(i)
      }
      centroids = Array.tabulate(kk)(c =>
        if (cnts(c) == 0) centroids(c)
        else sums(c).map(_ / cnts(c)))
    }
    val centDf = spark.createDataFrame(
      centroids.toIndexedSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
    ).toDF("list_id", "centroid")
    val e = embeddings.select(col("vec_id"), col("embedding"))
    def sqdist = aggregate(zip_with(col("embedding"), col("centroid"),
      (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, v) => acc + v)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("list_id"))
    val assigned = e.crossJoin(broadcast(centDf))
      .withColumn("d", sqdist)
      .withColumn("rn", row_number().over(wAssign)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("list_id"))
    val qProbe = e.filter(col("vec_id") < nQueries).crossJoin(broadcast(centDf))
      .withColumn("d", sqdist)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("d"), col("list_id"))))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("list_id"))
    val sims = qProbe.join(assigned, "list_id")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("qv"), col("embedding")) /
          (norm(col("qv")) * norm(col("embedding"))), roundTo).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("bigint").as("rnk"),
        col("vec_id").as("neighbor"), col("cosine"))
  }
}
