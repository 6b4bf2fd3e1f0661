package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaFeatures, MediaRecord}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    MediaRecord(1L, "image", Array[Byte](1, 2, 3, 4), Map("codec" -> "fake")),
    MediaRecord(2L, "video", Array.fill[Byte](100)(7), Map("codec" -> "fake")),
    MediaRecord(3L, "audio", Array.emptyByteArray, Map.empty)).toDS()

  test("featurize is partition-wise, deterministic, and schema-typed") {
    val f1 = Multimodal.featurize(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.featurize(media.repartition(3)).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq) // partitioning must not change results
    val img = f1.head
    assert(img.n_bytes == 4 && img.checksum == 10)
    assert(f1(1).frames > 1)                  // video fake-samples frames
    assert(f1(2).n_bytes == 0 && f1(2).frames == 1)
  }

  test("pluggable decoder is honored") {
    val constant: Multimodal.Decoder =
      (id, t, _) => MediaFeatures(id, t, -1L, -1L, 0, 0, 0)
    val out = Multimodal.featurize(media, constant).collect()
    assert(out.forall(f => f.n_bytes == -1L && f.checksum == -1L))
  }

  test("byteHistogram decoder derives histogram features, not byte sums") {
    // bytes {1,1,2}: 2 distinct values, modal freq 2, min byte 1
    val hist = Multimodal.Decoder.byteHistogram(
      7L, "video", Array[Byte](1, 1, 2))
    assert(hist.n_bytes == 3 && hist.checksum == 2)
    assert(hist.width == 16 + 2 && hist.height == 16 + 1)
    assert(hist.frames == 1 + 2)
    // empty payload: all-zero features, no crash on the empty histogram
    val empty = Multimodal.Decoder.byteHistogram(8L, "image", Array.emptyByteArray)
    assert(empty.n_bytes == 0 && empty.checksum == 0
      && empty.width == 16 && empty.height == 16 && empty.frames == 1)
    // the two decoders genuinely disagree through the same chain
    val viaFake = Multimodal.featurize(media).collect().sortBy(_.media_id)
    val viaHist = Multimodal.featurize(media, Multimodal.Decoder.byteHistogram)
      .collect().sortBy(_.media_id)
    assert(viaFake.map(_.media_id).toSeq == viaHist.map(_.media_id).toSeq)
    assert(viaFake.map(_.checksum).toSeq != viaHist.map(_.checksum).toSeq)
  }

  test("frameSample chunks payloads and keeps every stride-th frame") {
    val frames = Multimodal.frameSample(media, frameBytes = 32, stride = 2)
      .collect().groupBy(_.media_id)
    // 4-byte image: one 4-byte chunk, idx 0 kept
    assert(frames(1L).map(f => (f.frame_idx, f.frame.length)).toSeq == Seq((0, 4)))
    // 100-byte video → chunks 32,32,32,4 (idx 0..3); stride 2 keeps 0 and 2
    assert(frames(2L).map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    assert(frames(2L).forall(_.frame.length == 32))
    assert(!frames.contains(3L)) // empty payload yields no frames
  }

  test("resizeStub bounds frame size and is deterministic") {
    val frames = Multimodal.frameSample(media, frameBytes = 64, stride = 1)
    val resized = Multimodal.resizeStub(frames, targetBytes = 10).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(_.frame.length <= 10))
    val again = Multimodal.resizeStub(frames, targetBytes = 10).collect()
    assert(resized.map(_.frame.toSeq).toSeq == again.map(_.frame.toSeq).toSeq)
  }

  test("payloadMeta matches featurize on byte length") {
    val meta = Multimodal.payloadMeta(media.toDF(),
        org.apache.spark.sql.functions.col("media_id"),
        org.apache.spark.sql.functions.col("payload"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feat = Multimodal.featurize(media).collect()
      .map(f => f.media_id -> f.n_bytes).toMap
    assert(meta == feat)
  }
}
