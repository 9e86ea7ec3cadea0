package graft

import org.apache.spark.sql.functions._
import graft.sources.GraphFiles
import java.nio.file.{Files, Path}

/** wildriver-equivalent I/O (SURVEY §2.1 S1/S3/S7/S8): golden fixtures +
  * round-trips, mirroring the reference's wildriver unit tests
  * (reference wildriver/src/test/MetisFile_test.cpp etc.).
  */
class GraphFilesSpec extends SparkSpec {

  private def tmpFile(content: String): String = {
    val p = Files.createTempFile("graft-gf", ".txt")
    Files.writeString(p, content)
    p.toString
  }

  test("METIS reader: unweighted golden fixture (triangle + pendant)") {
    // 4 vertices, 4 edges: triangle 1-2-3 + pendant 4 on 1 (1-indexed file)
    val g = tmpFile(
      """% a comment
        |4 4
        |2 3 4
        |1 3
        |1 2
        |1
        |""".stripMargin)
    val (edges, verts) = GraphFiles.readMetis(spark, g)
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(e == Set((0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 1L), (0L, 3L, 1L)))
    assert(verts.count() == 4)
    assert(verts.agg(sum(col("vwgt"))).head().getLong(0) == 4L)
  }

  test("METIS reader: weighted fmt=011 with an isolated vertex") {
    // fmt 011: vertex weight then (dst wgt) pairs; vertex 3 isolated (wgt 7)
    val g = tmpFile(
      """3 1 011 1
        |5 2 9
        |4 1 9
        |7
        |""".stripMargin)
    val (edges, verts) = GraphFiles.readMetis(spark, g)
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(e.toSeq == Seq((0L, 1L, 9L)))
    val vw = verts.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vw == Map(0L -> 5L, 1L -> 4L, 2L -> 7L))
  }

  test("METIS reader rejects asymmetric adjacency") {
    val g = tmpFile("2 1 001\n2 5\n\n")
    intercept[IllegalArgumentException] {
      GraphFiles.readMetis(spark, g)
    }
  }

  test("METIS round-trip: write then read reproduces edges and weights") {
    val e = Fixtures.twoCliques
    val verts = spark.createDataFrame(
      Fixtures.vertsOf(e).map(v => (v, 1L))).toDF("vid", "vwgt")
    val out = Files.createTempDirectory("graft-metis").resolve("g.graph").toString
    GraphFiles.writeMetis(edgesDf(e), verts, out)
    val (back, bverts) = GraphFiles.readMetis(spark, out)
    assert(back.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      == e.toSet)
    assert(bverts.count() == 10)
  }

  test("SNAP reader: comments skipped, duplicates+self-loops dropped, canonical") {
    val g = tmpFile(
      """# Undirected graph
        |# src dst
        |0	1
        |1	0
        |2	2
        |1	2
        |""".stripMargin)
    val e = GraphFiles.readSnap(spark, g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(e == Set((0L, 1L, 1L), (1L, 2L, 1L)))
  }

  test("partition sink writes one pid per line in vertex order") {
    val assign = assignDf(Map(2L -> 1, 0L -> 0, 1L -> 2))
    val out = Files.createTempDirectory("graft-part").resolve("p.txt")
    GraphFiles.writePartition(assign, out.toString)
    assert(Files.readString(out) == "0\n2\n1\n")
  }

  test("training-list reader adds a 0/1 constraint column (S8)") {
    val list = tmpFile("1\n3\n")
    val verts = vertsDf(Seq(0L, 1L, 2L, 3L))
    val got = GraphFiles.readTrainingList(spark, list, verts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("CSR text reader (S4): 1-based autodetect, comments, empty rows") {
    val g = tmpFile(
      """% comment
        |2 1.5 3 2.0
        |1 1.5
        |
        |1 2.0
        |""".stripMargin)
    val got = GraphFiles.readCsr(spark, g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // min column 1 => 1-based; empty line = row 2 with no entries
    assert(got == Set((0L, 1L, 1.5), (0L, 2L, 2.0), (1L, 0L, 1.5),
      (3L, 0L, 2.0)))
  }

  test("CSR text reader (S4): 0-based when column 0 appears") {
    val g = tmpFile("0 1.0\n1 2.0\n")
    val got = GraphFiles.readCsr(spark, g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((0L, 0L, 1.0), (1L, 1L, 2.0)))
  }

  test("CSR round-trip: write then read reproduces entries") {
    val entries = spark.createDataFrame(Seq(
      (0L, 1L, 1.5), (0L, 2L, 2.0), (2L, 0L, 3.0))).toDF("row", "col", "val")
    val out = Files.createTempDirectory("graft-csr").resolve("m.csr").toString
    GraphFiles.writeCsr(entries, 3L, out)
    val back = GraphFiles.readCsr(spark, out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(back == Set((0L, 1L, 1.5), (0L, 2L, 2.0), (2L, 0L, 3.0)))
  }

  test("MatrixMarket reader (S5): general real coordinate, 1-based") {
    val g = tmpFile(
      """%%MatrixMarket matrix coordinate real general
        |% a comment
        |3 3 2
        |1 2 1.5
        |3 1 2.5
        |""".stripMargin)
    val got = GraphFiles.readMatrixMarket(spark, g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((0L, 1L, 1.5), (2L, 0L, 2.5)))
  }

  test("MatrixMarket reader (S5): symmetric pattern mirrors off-diagonals") {
    val g = tmpFile(
      """%%MatrixMarket matrix coordinate pattern symmetric
        |3 3 3
        |2 1
        |3 1
        |2 2
        |""".stripMargin)
    val got = GraphFiles.readMatrixMarket(spark, g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 0L, 1.0), (0L, 1L, 1.0), (2L, 0L, 1.0),
      (0L, 2L, 1.0), (1L, 1L, 1.0)))
  }

  test("MatrixMarket reader rejects a non-MM banner") {
    val g = tmpFile("3 3 1\n1 1 1.0\n")
    intercept[IllegalArgumentException] {
      GraphFiles.readMatrixMarket(spark, g)
    }
  }

  test("plain vector (S6) round-trip keeps order; comments skipped on read") {
    val g = tmpFile("# perm\n5\n3\n8\n")
    val vec = GraphFiles.readVector(spark, g).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(vec.toSeq == Seq((0L, 5.0), (1L, 3.0), (2L, 8.0)))
    val out = Files.createTempDirectory("graft-vec").resolve("v.txt")
    GraphFiles.writeVector(
      spark.createDataFrame(vec).toDF("idx", "value"), out.toString)
    assert(Files.readString(out) == "5\n3\n8\n")
  }

  test("dense-matrix reader (S6): row-major whitespace values") {
    val g = tmpFile("1.0 2.0\n3.0 4.0\n")
    val got = GraphFiles.readDenseMatrix(spark, g).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((0L, 0L, 1.0), (0L, 1L, 2.0),
      (1L, 0L, 3.0), (1L, 1L, 4.0)))
  }
}
