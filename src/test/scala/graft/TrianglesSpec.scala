package graft

import org.apache.spark.sql.functions._
import graft.operators.Triangles

/** Exact triangle counts vs brute force (north-rule bar: exact). The
  * degree-ordered orientation must count each triangle exactly once even on
  * power-law hubs (star) and dense blocks (cliques).
  */
class TrianglesSpec extends SparkSpec {

  test("known counts: K5+K5+bridge=20, grid=0, star=0, cycle=0") {
    assert(Triangles.count(edgesDf(Fixtures.twoCliques)) == 20L) // 2 * C(5,3)
    assert(Triangles.count(edgesDf(Fixtures.grid4x4)) == 0L)
    assert(Triangles.count(edgesDf(Fixtures.star17)) == 0L)
    assert(Triangles.count(edgesDf(Fixtures.cycle9)) == 0L)
  }

  test("zipf graph matches brute force exactly") {
    val e = Fixtures.zipf(200)
    assert(Triangles.count(edgesDf(e)) == Oracles.triangles(e))
  }

  test("per-vertex participation matches brute force, zeros included") {
    val e = Fixtures.zipf(150)
    val verts = Fixtures.vertsOf(e) ++ Seq(9999L) // plus an isolated vertex
    val got = Triangles.perVertex(edgesDf(e), vertsDf(verts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Oracles.trianglesPerVertex(e, verts)
    assert(got == want)
    assert(got(9999L) == 0L)
  }

  test("per-vertex sums to 3x the global count") {
    val e = Fixtures.twoCliques
    val pv = Triangles.perVertex(edgesDf(e), vertsDf(Fixtures.vertsOf(e)))
      .agg(sum(col("triangles"))).head().getLong(0)
    assert(pv == 3 * 20L)
  }
}
