package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal-column plumbing: binary payloads with typed metadata, frame
  * sampling, and the batched decode-stub stage (the mapInPandas-shaped
  * mapPartitions pass a real codec would plug into).
  */
class MultimodalSpec extends SparkSpec {

  private def docsDf = spark.createDataFrame(Seq(
    (0L, "a short doc"),
    (1L, "b " * 50 + "tail"),
    (2L, "c " * 120 + "video payload"),
    (3L, "d"),
    (4L, "e " * 40),
    (5L, "f " * 200 + "another video"))).toDF("doc_id", "text")

  test("media table: binary payload + deterministic typed metadata") {
    val meta = Multimodal.metadata(Multimodal.mediaFromDocs(docsDf))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(meta.size == 6)
    assert(meta(0L)._1 == "image" && meta(1L)._1 == "audio" &&
      meta(2L)._1 == "video")
    assert(meta(0L)._2 == 11L, "n_bytes = UTF-8 byte length")
    assert(meta(0L)._3 == 11 % 640 + 16 && meta(0L)._4 == 11 % 480 + 16)
  }

  test("frame sampling: every 4th 66-byte frame, byte-exact fingerprints") {
    val media = Multimodal.mediaFromDocs(docsDf)
    val frames = Multimodal.frameSample(media, 66, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // only video rows (doc_id % 3 == 2) appear
    assert(frames.map(_._1).toSet == Set(2L, 5L))
    // doc 2: 253 bytes -> ceil(253/66)=4 frames -> sampled {0}
    val d2 = frames.filter(_._1 == 2L).map(_._2).sorted
    assert(d2.sameElements(Array(0L)), s"doc2 frames ${d2.mkString(",")}")
    // doc 5: 413 bytes -> ceil(413/66)=7 frames -> sampled {0, 4}
    val d5 = frames.filter(_._1 == 5L).map(_._2).sorted
    assert(d5.sameElements(Array(0L, 4L)), s"doc5 frames ${d5.mkString(",")}")
    // fingerprint equals md5 of the hex slice of the true bytes
    val payload = ("c " * 120 + "video payload").getBytes("UTF-8")
    val hx = payload.map("%02X".format(_)).mkString
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(hx.substring(0, 132).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(frames.find(f => f._1 == 2L && f._2 == 0L).get._3 == expect)
  }

  test("decode stub: one row per media row, fixed feature shape, deterministic") {
    val media = Multimodal.mediaFromDocs(docsDf)
    val f1 = Multimodal.decodeStub(spark, media, dim = 8).collect()
      .sortBy(_.doc_id)
    assert(f1.length == 6, "one feature row per media row")
    assert(f1.forall(_.features.length == 8), "fixed feature width")
    assert(f1.forall(r => r.features.forall(v => v >= -1f && v < 1f)))
    assert(f1.map(_.n_bytes).take(1).head == 11)
    val f2 = Multimodal.decodeStub(spark, media, dim = 8).collect()
      .sortBy(_.doc_id)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq,
      "stub features are deterministic")
  }
}
