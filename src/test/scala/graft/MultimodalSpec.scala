package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary-column plumbing: stats, frame sampling, and the batched
  * decode stub (deterministic fake behind the production mapPartitions
  * shape). */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def bytes(s: String) = s.getBytes(StandardCharsets.UTF_8)

  private lazy val assets = Seq(
    (1L, bytes("PNG0" + "x" * 600)),
    (2L, bytes("JPG0tiny")),
    (3L, bytes("plain payload no magic")),
    (4L, bytes(""))).toDF("asset_id", "payload")

  test("binaryStats: byte length, md5, magic sniff") {
    val got = Multimodal.binaryStats(assets, "asset_id", "payload")
      .orderBy("asset_id").collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(604, 8, 22, 0))
    assert(got.map(_.getString(3)).toSeq == Seq("png", "jpeg", "unknown", "unknown"))
    // md5 of the raw bytes — spot-check against java's digest
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes("JPG0tiny")).map("%02x".format(_)).mkString
    assert(got(1).getString(2) == d)
  }

  test("sampleFrames: fixed-size chunks, short tail, empty payload yields one empty frame") {
    val got = Multimodal.sampleFrames(assets, "asset_id", "payload", frameBytes = 256)
      .orderBy("asset_id", "frame_no").collect()
    val byAsset = got.groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(2)).toSeq).toMap
    assert(byAsset(1L) == Seq(256, 256, 92)) // 604 bytes -> 3 frames
    assert(byAsset(2L) == Seq(8))
    assert(byAsset(4L) == Seq(0)) // empty payload still emits frame 0
    assert(got.filter(_.getLong(0) == 1L).map(_.getInt(1)).toSeq == Seq(0, 1, 2))
  }

  test("decode stub: deterministic fake dims, schema, n_pixels = w*h") {
    val meta = Multimodal.decodeImageMetaStub(assets, "asset_id", "payload")
    assert(meta.schema == Multimodal.imageMetaSchema)
    val rows = meta.orderBy("asset_id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("png", "jpeg", "unknown", "unknown"))
    rows.foreach { r =>
      val (w, h, px) = (r.getInt(2), r.getInt(3), r.getLong(4))
      assert(w >= 1 && w <= 1920 && h >= 1 && h <= 1080 && px == w.toLong * h)
    }
    // deterministic across runs
    val again = Multimodal.decodeImageMetaStub(assets, "asset_id", "payload")
      .orderBy("asset_id").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
