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

  test("perceptualHash matches the hand-computed aHash bit rule") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // reference aHash: cell of byte k = k*bits div len; bit j set iff
    // cell mean > payload mean (exact cross-multiplied integers)
    def ref(bytes: Array[Byte], bits: Int): Long = {
      val len = bytes.length.toLong
      val vals = bytes.map(_ & 0xff)
      val cells = vals.zipWithIndex
        .groupBy { case (_, k) => (k * bits / len).toInt }
        .view.mapValues(a => (a.map(_._1.toLong).sum, a.length.toLong)).toMap
      val ts = vals.map(_.toLong).sum
      val tn = len
      cells.collect { case (j, (s, n)) if s * tn > ts * n => 1L << j }.sum
    }
    val payloads = Seq(
      1L -> "the quick brown fox jumps over the lazy dog, twice over".getBytes("UTF-8"),
      2L -> Array.tabulate(300)(i => ((i * 37 + 11) % 251).toByte),
      3L -> Array[Byte](0, 127), // 2 bytes: the minimum accepted payload
      4L -> Array[Byte](5))      // 1 byte: dropped (no cells to compare)
    val df = payloads.toDF("media_id", "payload")
    val got = Multimodal.perceptualHash(df, col("media_id"), col("payload"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!got.contains(4L), "sub-2-byte payloads must drop")
    payloads.filter(_._2.length >= 2).foreach { case (id, bs) =>
      assert(got(id) == ref(bs, 60), s"payload $id hash mismatch")
    }
    // reorder WITHIN a cell leaves the hash unchanged; a byte edit does not
    val big = payloads(1)._2
    val swapped = big.clone(); swapped(0) = big(1); swapped(1) = big(0)
    val edited = big.clone(); edited(0) = 0xff.toByte
    val df2 = Seq(10L -> big, 11L -> swapped, 12L -> edited)
      .toDF("media_id", "payload")
    val h2 = Multimodal.perceptualHash(df2, col("media_id"), col("payload"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h2(10L) == h2(11L), "same-cell byte swap must be hash-invariant")
    assert(java.lang.Long.bitCount(h2(10L) ^ h2(12L)) <= 3,
      "a one-byte edit should stay within the banded hamming radius here")
  }

  test("tweak recall is exactly the margin model's prediction; the banded miner is exact in-threshold") {
    // The near-dedup gate's tweak plants (first byte → 0xff) are caught
    // 85–96% — this pins WHY, with an exact model instead of a measured
    // constant. Derivation from the cross-multiplied bit rule
    // (bit j = 1 iff m_j > 0, m_j = s_j·tn − ts·n_j): the tweak adds
    // Δ = 255 − b₀ to cell 0's sum AND the total, so
    //   j ≠ 0: m_j' = m_j − Δ·n_j  → flips (1→0) iff 0 < m_j ≤ Δ·n_j,
    //          i.e. exactly the cells whose mean sits within Δ/tn of the
    //          global mean (0→1 impossible: the margin only drops);
    //   j = 0: m_0' = m_0 + Δ·(tn − n_0) → flips (0→1) iff
    //          m_0 ≤ 0 < m_0 + Δ·(tn − n_0).
    // A tweak is a near-dup BY THE HASH'S OWN DEFINITION iff that flip
    // count ≤ 3; the 4×15-band pigeonhole then catches it with recall
    // EXACTLY 1 (≤ 3 flips leave ≥ 1 band intact) — sub-100% plant catch
    // is a property of the perturbation, never a miner miss. Both claims
    // are asserted exactly below on the fixture's own tweak population.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.operators.DedupOps
    val bits = 60
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8"))
      .filter(_._2.length >= 2)
    def cellsOf(bytes: Array[Byte]): (Map[Int, (Long, Long)], Long, Long) = {
      val len = bytes.length.toLong
      val cm = bytes.map(_ & 0xff).zipWithIndex
        .groupBy { case (_, k) => (k * bits / len).toInt }
        .view.mapValues(a => (a.map(_._1.toLong).sum, a.length.toLong)).toMap
      (cm, bytes.map(b => (b & 0xff).toLong).sum, len)
    }
    def predictedHamming(bytes: Array[Byte]): Int = {
      val delta = 255L - (bytes(0) & 0xff)
      if (delta == 0) 0
      else {
        val (cm, ts, tn) = cellsOf(bytes)
        val drops = cm.count { case (j, (s, n)) =>
          j != 0 && { val m = s * tn - ts * n; m > 0 && m <= delta * n } }
        val (s0, n0) = cm(0)
        val m0 = s0 * tn - ts * n0
        drops + (if (m0 <= 0 && m0 + delta * (tn - n0) > 0) 1 else 0)
      }
    }
    val tweakBase = docs.filter { case (id, _) => id % 20 == 7 }
    val tweaks = tweakBase.map { case (id, b) =>
      val c = b.clone(); c(0) = 0xff.toByte; (id + 2000000000000L, c) }
    val media = (docs ++ tweaks).toSeq.toDF("media_id", "payload")
    val ph = Multimodal.perceptualHash(media, col("media_id"), col("payload"), bits)
    val hashes = ph.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1. margin model == actual hamming, for EVERY tweak (no hash replay
    //    of the tweaked payload goes into the prediction)
    tweakBase.foreach { case (id, b) =>
      val actual = java.lang.Long.bitCount(
        hashes(id) ^ hashes(id + 2000000000000L))
      assert(predictedHamming(b) == actual,
        s"doc $id: margin model predicted ${predictedHamming(b)}, hash moved $actual bits")
    }
    // 2. the banded miner returns EXACTLY the brute-force hamming ≤ 3
    //    pair set (pigeonhole exactness — in-threshold recall 1)
    val ids = hashes.keys.toArray.sorted
    val brute = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      h = java.lang.Long.bitCount(hashes(ids(i)) ^ hashes(ids(j))) if h <= 3
    } yield (ids(i), ids(j), h)).toSet
    val mined = DedupOps.simHashBandedPairs(ph, bands = 4, maxDist = 3, bits = bits)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        java.lang.Long.bitCount(hashes(r.getLong(0)) ^ hashes(r.getLong(1))))).toSet
    assert(mined == brute, "banded miner diverged from brute-force in-threshold pairs")
    // 3. measured catch rate ≥ the model's vs-original in-threshold
    //    fraction (a tweak may also pair with a DIFFERENT doc), and the
    //    predicted fraction sits in the documented 85–96% band
    val caught = mined.flatMap { case (a, b, _) => Seq(a, b) }
      .count(_ >= 2000000000000L)
    val predicted = tweakBase.count { case (_, b) => predictedHamming(b) <= 3 }
    assert(caught >= predicted)
    assert(tweakBase.nonEmpty &&
      predicted.toDouble / tweakBase.length >= 0.80,
      s"predicted in-threshold fraction $predicted/${tweakBase.length} fell below the documented band")
  }
}
