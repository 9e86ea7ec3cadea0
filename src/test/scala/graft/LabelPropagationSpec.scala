package graft

import org.apache.spark.sql.functions._
import graft.operators.LabelPropagation

/** Synchronous LP vs the in-JVM oracle: weighted votes, ties to the smallest
  * label, fixed rounds — exact equality (deterministic by construction).
  */
class LabelPropagationSpec extends SparkSpec {

  private def collect(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("vid"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("LP equals synchronous oracle on all fixtures, several round counts") {
    val cases = Seq(Fixtures.path8, Fixtures.cycle9, Fixtures.star17,
      Fixtures.twoCliques, Fixtures.grid4x4, Fixtures.zipf(150))
    for (e <- cases; rounds <- Seq(1, 3, 4)) {
      val verts = Fixtures.vertsOf(e)
      val got = collect(LabelPropagation.run(edgesDf(e), vertsDf(verts), rounds))
      assert(got == Oracles.labelProp(e, verts, rounds),
        s"LP mismatch rounds=$rounds edges=${e.take(3)}...")
    }
  }

  test("communities: two cliques converge to two labels; bridge can't merge them") {
    val e = Fixtures.twoCliques
    val verts = Fixtures.vertsOf(e)
    val got = collect(LabelPropagation.run(edgesDf(e), vertsDf(verts), 6))
    assert(got.values.toSet.size == 2, s"expected 2 communities, got $got")
    assert((0L to 4L).map(got).toSet.size == 1)
    assert((5L to 9L).map(got).toSet.size == 1)
  }

  test("isolated vertices keep their own label") {
    val e = Seq((0L, 1L, 1L))
    val got = collect(LabelPropagation.run(edgesDf(e), vertsDf(Seq(0L, 1L, 9L)), 3))
    assert(got(9L) == 9L)
  }

  test("weights dominate votes: heavy edge wins over more unit edges") {
    // vertex 2 has neighbors 0 (w=10) and {3,4,5} (w=1 each);
    // round 1: 2 adopts label 0 (score 10 > 3x1)
    val e = Seq((0L, 2L, 10L), (2L, 3L, 1L), (2L, 4L, 1L), (2L, 5L, 1L))
    val verts = Seq(0L, 2L, 3L, 4L, 5L)
    val got = collect(LabelPropagation.run(edgesDf(e), vertsDf(verts), 1))
    assert(got(2L) == 0L)
    assert(got == Oracles.labelProp(e, verts, 1))
  }
}
