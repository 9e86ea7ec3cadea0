package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph file formats of the reference's wildriver I/O layer, re-expressed
  * as Spark sources/sinks over the canonical relational graph
  * (`edges(src,dst,wgt)` canonical src<dst + `vertices(vid,vwgt)`):
  *
  *   - METIS `.graph` text (reference wildriver/src/MetisFile.cpp; header
  *     `nvtxs nedges [fmt [ncon]]`, 1-indexed adjacency lines, optional
  *     vertex/edge weights) — [[readMetis]] / [[writeMetis]];
  *   - SNAP edge list (reference wildriver/src/SNAPFile.hpp: `# comment`
  *     header lines, whitespace-separated id pairs) — [[readSnap]];
  *   - partition-assignment sink (reference src/mtmetis_bin.c:655-669: one
  *     pid per line in vertex order) — [[writePartition]];
  *   - training-set vertex list (reference `-l`, src/mtmetis_bin.c:592-627:
  *     listed vertices get an extra 0/1 weight constraint) —
  *     [[readTrainingList]].
  *
  * Line-number-addressed formats need stable line ids; `spark.read.text`
  * keeps per-file line order, so ids come from a per-partition offset scan
  * (the one legitimate `zipWithIndex`-style RDD use, SURVEY §1.4). Writers
  * emit a single ordered text file — these formats exist to interoperate
  * with single-node tools, so a 1-file sink is the semantics, not a
  * scalability bug (large-scale interchange stays parquet/Iceberg).
  */
object GraphFiles {

  /** lines with stable 0-based line numbers */
  private def numberedLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val rdd = spark.read.textFile(path).rdd.zipWithIndex()
    rdd.map { case (l, i) => (i, l) }.toDF("lineno", "line")
  }

  /** METIS .graph reader → (edges canonical src<dst with wgt,
    * vertices(vid, vwgt)); vertex ids 0-based (file is 1-based).
    * Symmetry is validated: every directed adjacency entry must have its
    * reverse (reference check_graph, src/check.c:342-390).
    */
  def readMetis(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    // keep blank lines: an isolated vertex is a (possibly empty) line
    val lines = numberedLines(spark, path)
      .filter(!col("line").startsWith("%"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("lineno"))))
    val header = lines.filter(col("rank") === 1).head().getString(1)
      .trim.split("\\s+").map(_.toLong)
    val (nvtxs, fmt, ncon) = (header(0),
      if (header.length > 2) header(2).toString.reverse.padTo(3, '0').reverse else "000",
      if (header.length > 3) header(3).toInt else 1)
    require(fmt(0) == '0',
      s"METIS fmt=$fmt: vertex sizes (fmt=1xx) unsupported")
    val hasVwgt = fmt(1) == '1'
    val hasAdjwgt = fmt(2) == '1'
    val nconEff = if (hasVwgt) ncon else 0
    val toks = lines.filter(col("rank") > 1)
      .select((col("rank") - 2).cast("long").as("vid"),
        filter(split(trim(col("line")), "\\s+"),
          x => length(x) > 0).as("t"))
    val vertices = toks.select(col("vid"),
      if (hasVwgt)
        aggregate(slice(col("t"), 1, nconEff),
          lit(0L), (acc, x) => acc + x.cast("long")).as("vwgt")
      else lit(1L).as("vwgt"))
    val stride = if (hasAdjwgt) 2 else 1
    val adjToks = toks.select(col("vid"),
      slice(col("t"), lit(nconEff + 1), greatest(size(col("t")), lit(1))).as("a"))
      .select(col("vid"), posexplode_outer(col("a")))
      .filter(col("col").isNotNull && length(col("col")) > 0)
    val dir =
      if (hasAdjwgt)
        adjToks.filter(col("pos") % 2 === 0)
          .select(col("vid"), col("pos"), (col("col").cast("long") - 1).as("dst"))
          .join(adjToks.filter(col("pos") % 2 === 1)
            .select(col("vid"), (col("pos") - 1).as("pos"),
              col("col").cast("long").as("wgt")), Seq("vid", "pos"))
          .select(col("vid").as("src"), col("dst"), col("wgt"))
      else adjToks.select(col("vid").as("src"),
        (col("col").cast("long") - 1).as("dst"), lit(1L).as("wgt"))
    // symmetry check: each (src,dst,wgt) needs its mirror
    val asym = dir.as("a").join(dir.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src") &&
          col("a.wgt") === col("b.wgt"), "left_anti").count()
    require(asym == 0, s"METIS graph not symmetric: $asym unmatched entries")
    val edges = dir.filter(col("src") < col("dst"))
    require(vertices.count() == nvtxs, "header nvtxs mismatch")
    (edges.select(col("src"), col("dst"), col("wgt")), vertices)
  }

  /** METIS .graph writer (inverse of [[readMetis]]; fmt=001 weighted edges,
    * fmt=011 when vertex weights are non-uniform).
    */
  def writeMetis(edges: DataFrame, vertices: DataFrame, path: String): Unit = {
    val spark = edges.sparkSession
    val sym = edges.select(col("src"), col("dst"), col("wgt"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"), col("wgt")))
    val nv = vertices.count()
    val ne = edges.count()
    val uniformV = vertices.agg(countDistinct(col("vwgt"))).head().getLong(0) == 1 &&
      vertices.limit(1).select(col("vwgt")).head().getLong(0) == 1L
    val fmt = if (uniformV) "001" else "011"
    val adjLines = vertices.select(col("vid"), col("vwgt"))
      .join(sym.groupBy(col("src").as("vid"))
        .agg(sort_array(collect_list(struct(col("dst"), col("wgt")))).as("ns")),
        Seq("vid"), "left")
      .select(col("vid"),
        concat_ws(" ",
          when(lit(!uniformV), col("vwgt").cast("string")).otherwise(lit(null)),
          concat_ws(" ", transform(coalesce(col("ns"),
            array().cast("array<struct<dst:bigint,wgt:bigint>>")),
            n => concat_ws(" ", (n("dst") + 1).cast("string"),
              n("wgt").cast("string"))))).as("line"))
      .orderBy(col("vid")).select(col("line"))
      .collect().map(_.getString(0))
    val header = s"$nv $ne $fmt" + (if (uniformV) "" else " 1")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (header +: adjLines).mkString("", "\n", "\n").getBytes)
  }

  /** SNAP edge list reader: `# comment` lines skipped, whitespace id pairs,
    * unweighted → canonical undirected simple edges.
    */
  def readSnap(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), "\\s+").as("t"))
      .select(element_at(col("t"), 1).cast("long").as("a"),
        element_at(col("t"), 2).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))
      .distinct()
      .withColumn("wgt", lit(1L))

  /** Partition-assignment sink: one pid per line, vertex order (S7). */
  def writePartition(assign: DataFrame, path: String): Unit = {
    val lines = assign.orderBy(col("vid"))
      .select(col("part").cast("string")).collect().map(_.getString(0))
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("", "\n", "\n").getBytes)
  }

  /** Training-list reader (S8): vertex ids, one per line → vertices gain an
    * extra 0/1 constraint column `in_train` (reference appends a vwgt
    * column; multi-constraint vwgt here is a struct of columns).
    */
  def readTrainingList(spark: SparkSession, path: String,
                       vertices: DataFrame): DataFrame = {
    val listed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(trim(col("value")).cast("long").as("vid")).distinct()
      .withColumn("in_train", lit(1L))
    vertices.join(listed, Seq("vid"), "left")
      .withColumn("in_train", coalesce(col("in_train"), lit(0L)))
  }

  private val CommentStart = Seq("#", "%", "/")
  private def isData(c: org.apache.spark.sql.Column) =
    length(trim(c)) > 0 &&
      !CommentStart.map(p => trim(c).startsWith(p)).reduce(_ || _)

  /** Plain-text CSR reader (S4; reference wildriver/src/CSRFile.cpp:
    * one line per matrix row, alternating `col val` token pairs; comment
    * lines start with #, %, or /; 0- vs 1-based column indexing is
    * auto-detected from the minimum column seen, CSRFile.cpp:253-263).
    * Returns entries `(row, col, val)`, both ids 0-based.
    */
  def readCsr(spark: SparkSession, path: String): DataFrame = {
    // keep EMPTY lines — an empty line is a matrix row with no entries
    // (CSRFile.cpp getNextRow reads every non-comment line as a row)
    val rows = numberedLines(spark, path)
      .filter(!CommentStart.map(p => trim(col("line")).startsWith(p))
        .reduce(_ || _))
      .withColumn("row", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("lineno"))) - 1)
      .select(col("row").cast("long").as("row"),
        filter(split(trim(col("line")), "\\s+"), t => length(t) > 0).as("t"))
    val entries = rows
      .select(col("row"), posexplode_outer(col("t")))
      .filter(col("col").isNotNull)
      .groupBy(col("row"), (col("pos") / 2).cast("long").as("pair"))
      .agg(min(struct(col("pos"), col("col"))).as("c"),
        max(struct(col("pos"), col("col"))).as("v"),
        count(lit(1)).as("n"))
      // a lone trailing token (odd token count) is a malformed line, not a
      // (col==val) entry — fail loudly like the reference pair-reader would
      .select(col("row"),
        when(col("n") === 2, col("c.col")).otherwise(raise_error(concat(
          lit("malformed CSR line (odd token count) at row "),
          col("row").cast("string")))).cast("long").as("col"),
        col("v.col").cast("double").as("val"))
    val minCol = entries.agg(min(col("col"))).head().get(0)
    val base = if (minCol != null && minCol.asInstanceOf[Long] > 0L) 1L else 0L
    entries.select(col("row"), (col("col") - base).as("col"), col("val"))
  }

  /** Plain-text CSR writer (inverse of [[readCsr]]; 1-based columns, the
    * reference's own write dialect, CSREncoder.cpp).
    */
  def writeCsr(entries: DataFrame, nRows: Long, path: String): Unit = {
    val byRow = entries
      .groupBy(col("row"))
      .agg(sort_array(collect_list(struct(col("col"), col("val")))).as("es"))
      .select(col("row"), concat_ws(" ", transform(col("es"),
        e => concat_ws(" ", (e("col") + 1).cast("string"),
          e("val").cast("string")))).as("line"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val lines = (0L until nRows).map(r => byRow.getOrElse(r, ""))
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("", "\n", "\n").getBytes)
  }

  /** MatrixMarket coordinate reader (S5; reference
    * wildriver/src/MatrixMarketFile.cpp:316-420: banner
    * `%%MatrixMarket matrix coordinate real|integer|pattern
    * general|symmetric`, `%` comments, size line `nrows ncols nnz`, then
    * 1-based `i j [v]` entries; symmetric stores the lower triangle and
    * implies the mirrored entries, :276-284). Returns `(row, col, val)`
    * 0-based with symmetric expansion applied (diagonal not doubled).
    */
  def readMatrixMarket(spark: SparkSession, path: String): DataFrame = {
    val banner = spark.read.text(path).limit(1).head().getString(0)
    require(banner.startsWith("%%MatrixMarket"),
      s"not a MatrixMarket file: '$banner'")
    val toks = banner.trim.split("\\s+").map(_.toLowerCase)
    require(toks.length >= 3 && toks(1) == "matrix" && toks(2) == "coordinate",
      s"unsupported MatrixMarket header: '$banner'")
    val pattern = toks.contains("pattern")
    val symmetric = toks.contains("symmetric")
    val data = numberedLines(spark, path)
      .filter(!trim(col("line")).startsWith("%") &&
        length(trim(col("line"))) > 0)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("lineno"))))
    val size = data.filter(col("rank") === 1).head().getString(1)
      .trim.split("\\s+").map(_.toLong)
    val entries = data.filter(col("rank") > 1)
      .select(filter(split(trim(col("line")), "\\s+"),
        t => length(t) > 0).as("t"))
      .select((element_at(col("t"), 1).cast("long") - 1).as("row"),
        (element_at(col("t"), 2).cast("long") - 1).as("col"),
        (if (pattern) lit(1.0)
         else element_at(col("t"), 3).cast("double")).as("val"))
    require(entries.count() == size(2),
      s"MatrixMarket nnz mismatch: header ${size(2)}")
    if (!symmetric) entries
    else entries.unionByName(
      entries.filter(col("row") =!= col("col"))
        .select(col("col").as("row"), col("row").as("col"), col("val")))
  }

  /** Plain vector file reader (S6; reference
    * wildriver/src/PlainVectorFile.cpp: one value per line, #/%// comment
    * lines skipped). Returns `(idx, value)` with 0-based positions.
    */
  def readVector(spark: SparkSession, path: String): DataFrame =
    numberedLines(spark, path)
      .filter(isData(col("line")))
      .withColumn("idx", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("lineno")))
        .cast("long") - 1)
      .select(col("idx"), trim(col("line")).cast("double").as("value"))

  /** Plain vector writer (inverse of [[readVector]]): values in idx order,
    * one per line — integral values rendered without a trailing `.0` (the
    * reference writes wgt_type integers, PlainVectorFile.cpp).
    */
  def writeVector(values: DataFrame, path: String): Unit = {
    val lines = values.orderBy(col("idx"))
      .select(when(col("value") === col("value").cast("long").cast("double"),
        col("value").cast("long").cast("string"))
        .otherwise(col("value").cast("string")).as("s"))
      .collect().map(_.getString(0))
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("", "\n", "\n").getBytes)
  }

  /** Dense-matrix text reader (S6; reference
    * wildriver/src/DenseMatrixFile.cpp: each non-comment line is one row
    * of whitespace-separated values). Returns `(row, col, val)` 0-based.
    */
  def readDenseMatrix(spark: SparkSession, path: String): DataFrame =
    numberedLines(spark, path)
      .filter(isData(col("line")))
      .withColumn("row", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("lineno")))
        .cast("long") - 1)
      .select(col("row"),
        posexplode(filter(split(trim(col("line")), "\\s+"),
          t => length(t) > 0)))
      .select(col("row"), col("pos").cast("long").as("col"),
        col("col").cast("double").as("val"))
}
