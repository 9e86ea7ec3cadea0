package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting by degree-ordered edge orientation + wedge join
  * (north rule item 2; SURVEY §2.4). Each undirected edge is oriented from
  * its lower (degree, vid) endpoint to the higher — the standard
  * compact-forward trick that bounds per-vertex out-degree to O(√m) on any
  * graph, which is what keeps the wedge self-join tractable on power-law
  * hubs (a raw self-join on a hub vertex would be quadratic; oriented, the
  * hub's wedges are generated from its low-degree neighbors instead).
  */
object Triangles {

  /** Oriented edge list (a → b with (deg,vid)(a) < (deg,vid)(b)). */
  def orient(edges: DataFrame): DataFrame = {
    val deg = GraphOps.degrees(edges).select(col("vid"), col("deg"))
    edges.select(col("src"), col("dst"))
      .join(deg.withColumnRenamed("vid", "src").withColumnRenamed("deg", "sd"), "src")
      .join(deg.withColumnRenamed("vid", "dst").withColumnRenamed("deg", "dd"), "dst")
      .select(
        when(struct(col("sd"), col("src")) < struct(col("dd"), col("dst")),
          struct(col("src").as("a"), col("dst").as("b")))
          .otherwise(struct(col("dst").as("a"), col("src").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
  }

  /** Global triangle count (each triangle counted exactly once). */
  def count(edges: DataFrame): Long = {
    val o = orient(edges).persist()
    val wedges = o.as("e1").join(o.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("wa"), col("e1.b").as("wm"), col("e2.b").as("wc"))
    val n = wedges.join(o.as("e3"),
        col("wa") === col("e3.a") && col("wc") === col("e3.b"))
      .count()
    o.unpersist()
    n
  }

  /** Per-vertex triangle participation counts (all three corners credited). */
  def perVertex(edges: DataFrame, vertices: DataFrame): DataFrame = {
    val o = orient(edges)
    val tris = o.as("e1").join(o.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .join(o.as("e3"), col("x") === col("e3.a") && col("z") === col("e3.b"),
        "left_semi")
      .select(col("x"), col("y"), col("z"))
    val corners = tris.select(col("x").as("vid"))
      .unionByName(tris.select(col("y").as("vid")))
      .unionByName(tris.select(col("z").as("vid")))
      .groupBy(col("vid"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
    vertices.select(col("vid")).distinct()
      .join(corners, Seq("vid"), "left")
      .select(col("vid"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** DuckDB SQL: global triangle count over caller CTE text. */
  def oracleSql(edgesCte: String): String =
    s"""WITH e_canon AS ($edgesCte),
       |sym AS (SELECT src, dst FROM e_canon UNION ALL SELECT dst, src FROM e_canon),
       |deg AS (SELECT src AS vid, COUNT(*) AS deg FROM sym GROUP BY src),
       |o AS (
       |  SELECT CASE WHEN (ds.deg, e.src) < (dd.deg, e.dst) THEN e.src ELSE e.dst END AS a,
       |         CASE WHEN (ds.deg, e.src) < (dd.deg, e.dst) THEN e.dst ELSE e.src END AS b
       |  FROM e_canon e
       |  JOIN deg ds ON e.src = ds.vid JOIN deg dd ON e.dst = dd.vid)
       |SELECT COUNT(*) AS n_triangles
       |FROM o e1 JOIN o e2 ON e1.b = e2.a JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin

  /** DuckDB SQL: per-vertex triangle counts over caller CTE text. */
  def perVertexOracleSql(edgesCte: String, vertsCte: String): String =
    s"""WITH e_canon AS ($edgesCte),
       |verts AS ($vertsCte),
       |sym AS (SELECT src, dst FROM e_canon UNION ALL SELECT dst, src FROM e_canon),
       |deg AS (SELECT src AS vid, COUNT(*) AS deg FROM sym GROUP BY src),
       |o AS (
       |  SELECT CASE WHEN (ds.deg, e.src) < (dd.deg, e.dst) THEN e.src ELSE e.dst END AS a,
       |         CASE WHEN (ds.deg, e.src) < (dd.deg, e.dst) THEN e.dst ELSE e.src END AS b
       |  FROM e_canon e
       |  JOIN deg ds ON e.src = ds.vid JOIN deg dd ON e.dst = dd.vid),
       |tris AS (
       |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM o e1 JOIN o e2 ON e1.b = e2.a JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b),
       |corners AS (
       |  SELECT vid, COUNT(*) AS triangles FROM (
       |    SELECT x AS vid FROM tris UNION ALL SELECT y FROM tris UNION ALL SELECT z FROM tris)
       |  GROUP BY vid)
       |SELECT v.vid, COALESCE(c.triangles, 0) AS triangles
       |FROM verts v LEFT JOIN corners c ON v.vid = c.vid ORDER BY v.vid""".stripMargin
}
