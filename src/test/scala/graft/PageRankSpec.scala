package graft

import org.apache.spark.sql.functions._
import graft.operators.{Csr, GraphOps, PageRank}

/** PageRank vs the dense in-JVM power-iteration oracle — the north-rule bar
  * is allclose 1e-6 per vertex (BASELINE.json).
  */
class PageRankSpec extends SparkSpec {

  private def collectRanks(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.select(col("vid"), col("rank")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def assertClose(got: Map[Long, Double], want: Map[Long, Double],
                          tol: Double = 1e-6): Unit = {
    assert(got.keySet == want.keySet, "vertex sets differ")
    for ((v, w) <- want)
      assert(math.abs(got(v) - w) <= tol, s"vid=$v got=${got(v)} want=$w")
  }

  private val cases = Seq(
    "path8" -> Fixtures.path8, "cycle9" -> Fixtures.cycle9,
    "star17" -> Fixtures.star17, "twoCliques" -> Fixtures.twoCliques,
    "grid4x4" -> Fixtures.grid4x4, "zipf200" -> Fixtures.zipf(200))

  test("fixedIterations matches dense oracle to 1e-6 on all fixtures") {
    for ((name, e) <- cases) {
      val verts = Fixtures.vertsOf(e)
      val got = collectRanks(
        PageRank.fixedIterations(edgesDf(e), vertsDf(verts), 0.85, 8))
      val want = Oracles.pageRank(e, verts, 0.85, 8)
      assertClose(got, want)
      assert(math.abs(got.values.sum - 1.0) < 1e-6, s"$name ranks must sum to 1")
    }
  }

  test("run() with isolated vertices redistributes dangling mass and sums to 1") {
    val (e, verts) = Fixtures.withIslands(100)
    val res = PageRank.run(spark, edgesDf(e), vertsDf(verts),
      damping = 0.85, maxIter = 12, tol = 0.0)
    val got = collectRanks(res.ranks)
    val want = Oracles.pageRank(e, verts, 0.85, 12, dangling = true)
    assertClose(got, want)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    assert(res.iterations == 12)
  }

  test("run() converges under tol and reports a small residual") {
    val e = Fixtures.twoCliques
    val res = PageRank.run(spark, edgesDf(e), vertsDf(Fixtures.vertsOf(e)),
      maxIter = 100, tol = 1e-10)
    assert(res.residual <= 1e-10)
    assert(res.iterations < 100, "should converge well before maxIter")
  }

  test("CSR-kernel PageRank matches the dense oracle on both block layouts") {
    val e = Fixtures.zipf(200)
    val verts = Fixtures.vertsOf(e) :+ 9999L // incl. an isolated vertex
    val want = Oracles.pageRank(e, verts, 0.85, 8)
    val bounds = GraphOps.edgeBalancedRanges(edgesDf(e), 4)
    assertClose(collectRanks(
      Csr.pageRank(spark, Csr.build(spark, edgesDf(e), bounds),
        vertsDf(verts), 0.85, 8)), want)
    // edge-granular layout splits hubs but must compute the same function
    assertClose(collectRanks(
      Csr.pageRank(spark, Csr.buildBalanced(spark, edgesDf(e), 4),
        vertsDf(verts), 0.85, 8)), want)
  }

  test("block-exchange fast path (CsrFast) computes the same ranks") {
    val e = Fixtures.zipf(200)
    val verts = Fixtures.vertsOf(e) :+ 9999L // incl. an isolated vertex
    val want = Oracles.pageRank(e, verts, 0.85, 8)
    val got = collectRanks(
      graft.operators.CsrFast.pageRank(spark,
        Csr.buildBalanced(spark, edgesDf(e), 4), vertsDf(verts), 0.85, 8,
        numParts = 3))
    assertClose(got, want)
    // bit-exact agreement with the DataFrame CSR path (same kernel, same
    // merge order)
    val df = collectRanks(
      Csr.pageRank(spark, Csr.buildBalanced(spark, edgesDf(e), 4),
        vertsDf(verts), 0.85, 8))
    assert(got.keySet == df.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - df(v)) <= 1e-12, s"vid $v: fast $r vs df ${df(v)}")
    }
  }

  test("single-exchange path (CsrDirect) computes the same ranks") {
    for ((name, e) <- cases) {
      val verts = Fixtures.vertsOf(e) :+ 9999L // incl. an isolated vertex
      val want = Oracles.pageRank(e, verts, 0.85, 8)
      val got = collectRanks(
        graft.operators.CsrDirect.pageRank(spark,
          Csr.buildBalanced(spark, edgesDf(e), 4), vertsDf(verts), 0.85, 8))
      assertClose(got, want)
      // bit-exact agreement with CsrFast (same kernel arithmetic, both merge
      // contributions in producer-block order)
      val fast = collectRanks(
        graft.operators.CsrFast.pageRank(spark,
          Csr.buildBalanced(spark, edgesDf(e), 4), vertsDf(verts), 0.85, 8,
          numParts = 3))
      assert(got.keySet == fast.keySet, s"$name vertex sets differ")
      got.foreach { case (v, r) =>
        assert(math.abs(r - fast(v)) <= 1e-12,
          s"$name vid $v: direct $r vs fast ${fast(v)}")
      }
      // the large-graph row-assembly path (prepareRows — no intermediate
      // Csr.Block) must produce bit-identical state, hence identical ranks
      val st = graft.operators.CsrDirect.prepareRows(spark, edgesDf(e),
        vertsDf(verts), numBlocks = 4)
      val rows = collectRanks(
        graft.operators.CsrDirect.toRanksDf(spark, st, 0.85,
          graft.operators.CsrDirect.iterate(st, 0.85, 8), vertsDf(verts)))
      st.unpersistAll()
      assert(rows.keySet == got.keySet, s"$name prepareRows vertex sets differ")
      rows.foreach { case (v, r) =>
        assert(math.abs(r - got(v)) <= 1e-12,
          s"$name vid $v: prepareRows $r vs prepare ${got(v)}")
      }
    }
  }

  test("CsrDirect state save/load round-trip is bit-exact") {
    val e = Fixtures.zipf(300)
    val verts = Fixtures.vertsOf(e)
    val st = graft.operators.CsrDirect.prepareRows(spark, edgesDf(e),
      vertsDf(verts), numBlocks = 4)
    val want = collectRanks(
      graft.operators.CsrDirect.toRanksDf(spark, st, 0.85,
        graft.operators.CsrDirect.iterate(st, 0.85, 6), vertsDf(verts)))
    val dir = java.nio.file.Files.createTempDirectory("graft-dstate")
      .toString
    graft.operators.CsrDirect.saveState(st, dir)
    st.unpersistAll()
    val st2 = graft.operators.CsrDirect.loadState(spark, dir)
    assert(st2.n == st.n && st2.nBlocks == st.nBlocks)
    val got = collectRanks(
      graft.operators.CsrDirect.toRanksDf(spark, st2, 0.85,
        graft.operators.CsrDirect.iterate(st2, 0.85, 6), vertsDf(verts)))
    st2.unpersistAll()
    assert(got == want, "loaded state must reproduce ranks bit-exactly")
  }
}
