package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media
  * (image/audio/video) travels as an opaque `binary` payload column with
  * typed metadata; decode / feature-extraction runs partition-wise over
  * typed Datasets (iterator-to-iterator, constant memory — the Scala
  * analogue of batched `mapInPandas`).
  *
  * The actual codec is STUBBED (`Decoder.fake`): this container has no
  * image/audio libraries, so decode is a deterministic fake keyed on the
  * payload bytes. Everything around it — the schema contract, the
  * partition-wise batch shape, the pluggable decoder signature, the
  * expression-level metadata features — is real and tested; swapping
  * `Decoder.fake` for a JNI/JavaCV decoder changes no plumbing.
  *
  * Scale: payloads never pass through a shuffle here — featurize first
  * (mapPartitions on the scan), shuffle only the small feature rows.
  * Partition sizing for ~MB payloads: lower
  * `spark.sql.files.maxPartitionBytes` so a partition's payload batch fits
  * executor memory.
  */
object Multimodal {

  /** The wire schema: one media object per row. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String,            // "image" | "audio" | "video" | ...
      payload: Array[Byte],          // opaque encoded bytes
      meta: Map[String, String])     // source-side metadata (codec, dims…)

  /** Decoded-media features (what a real decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: Long,                // sum of unsigned bytes — stands in
                                     // for content-derived features
      width: Int, height: Int,       // fake "decoded" dimensions
      frames: Int)

  /** A decoder turns one payload into features. Pluggable; the fake is
    * deterministic on the bytes so tests/oracles are stable. */
  type Decoder = (Long, String, Array[Byte]) => MediaFeatures

  object Decoder {
    /** Deterministic stand-in for the real codec (??? in production terms:
      * decode → resize → frame-sample). Derives pseudo-dimensions from the
      * byte content. */
    val fake: Decoder = (id, tpe, bytes) => {
      val checksum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
      MediaFeatures(id, tpe,
        n_bytes = bytes.length.toLong,
        checksum = checksum,
        width = 16 + (checksum % 64).toInt,
        height = 16 + ((checksum / 64) % 64).toInt,
        frames = if (tpe == "video") 1 + (bytes.length % 30) else 1)
    }

    /** Second, independent decoder: byte-HISTOGRAM features (distinct
      * byte count, modal frequency, smallest byte present) instead of
      * the byte-sum family — different feature semantics through the
      * IDENTICAL chain, proving `featurize` and the pipeline around it
      * are decoder-agnostic, not shaped around one fixture. Still
      * deterministic on the bytes, so the SQL oracle reproduces it. */
    val byteHistogram: Decoder = (id, tpe, bytes) => {
      val hist = new Array[Int](256)
      bytes.foreach(b => hist(b & 0xff) += 1)
      val distinct = hist.count(_ > 0)
      val maxFreq = if (bytes.isEmpty) 0 else hist.max
      val minByte = hist.indexWhere(_ > 0) // -1 when empty
      MediaFeatures(id, tpe,
        n_bytes = bytes.length.toLong,
        checksum = distinct.toLong,
        width = 16 + (maxFreq % 64),
        height = 16 + (if (minByte < 0) 0 else minByte % 64),
        frames = if (tpe == "video") 1 + (distinct % 30) else 1)
    }
  }

  /** Partition-wise decode/featurize: iterator-in, iterator-out — no
    * per-partition materialization, preserves input partitioning. */
  def featurize(media: Dataset[MediaRecord], decoder: Decoder = Decoder.fake)
               (implicit enc: org.apache.spark.sql.Encoder[MediaFeatures]): Dataset[MediaFeatures] =
    // null payloads read as empty: decoders see bytes, never null (and the
    // SQL-side oracles drop/zero null media rather than erroring)
    media.mapPartitions(_.map(r => decoder(r.media_id, r.media_type,
      if (r.payload == null) Array.emptyByteArray else r.payload)))

  /** One sampled frame of a media payload. */
  final case class FrameRecord(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: split the payload into fixed-size frames and keep
    * every `stride`-th — the 1→N generator shape of real video sampling
    * (decode replaced by byte chunking; a real codec changes only the
    * chunk step). Lazy iterator-to-iterator: `grouped` over the byte
    * array never materializes the frame list, so a partition's memory is
    * one payload + one frame regardless of media length. */
  def frameSample(media: Dataset[MediaRecord], frameBytes: Int, stride: Int)
                 (implicit enc: org.apache.spark.sql.Encoder[FrameRecord]): Dataset[FrameRecord] = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    media.mapPartitions(_.flatMap { r =>
      // null payload ≡ empty: zero frames, matching the SQL oracle's
      // range(0, NULL) → no rows (a raw grouped would NPE the job)
      val payload = if (r.payload == null) Array.emptyByteArray else r.payload
      payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, i) if i % stride == 0 => FrameRecord(r.media_id, i, chunk)
      }
    })
  }

  /** Resize stub: deterministic downsample of a frame to ≤ `targetBytes`
    * by KEEPING every step-th byte, step = ceil(len/target) (??? in
    * production terms: the real bilinear/area resize; same 1→1
    * partition-wise shape and output contract — bounded-size frames). */
  def resizeStub(frames: Dataset[FrameRecord], targetBytes: Int)
                (implicit enc: org.apache.spark.sql.Encoder[FrameRecord]): Dataset[FrameRecord] = {
    require(targetBytes > 0, "targetBytes must be positive")
    frames.mapPartitions(_.map { f =>
      val step = math.max(1, math.ceil(f.frame.length.toDouble / targetBytes).toInt)
      FrameRecord(f.media_id, f.frame_idx,
        (0 until f.frame.length by step).map(f.frame).toArray)
    })
  }

  /** Perceptual hash of a media payload — the average-hash (aHash)
    * construction over byte space: the payload splits into `bits` equal
    * CELLS (cell of byte k = k·bits div len); bit j is 1 iff cell j's
    * mean byte value exceeds the whole payload's mean. Means compare by
    * EXACT integer cross-multiplication (s_j·n_tot > s_tot·n_j — no
    * doubles cross an engine boundary), so a SQL oracle replays the hash
    * bit-for-bit. Position-SENSITIVE by construction — unlike a plain
    * byte-histogram simhash, which collapses for same-distribution
    * payloads (every doc of one corpus shares letter frequencies →
    * near-identical histograms → a degenerate all-pairs clique); cell
    * means differ whenever content ORDER differs, the property real
    * aHash/dHash/pHash get from their spatial grid.
    *
    * Near-dup behavior: a local byte edit perturbs ONE cell's mean (flips
    * only bits whose margin is within the edit); reordering within a cell
    * (re-encode jitter) leaves the hash unchanged. Returns
    * (doc_id, simhash) rows — the input contract of
    * [[graft.operators.DedupOps.simHashBandedPairs]]; 60 bits splits
    * into the 4×15 pigeonhole bands that cover Hamming ≤ 3.
    *
    * Payloads shorter than 2 bytes are dropped (no cells to compare —
    * and a 0/1-byte payload has no meaningful content signature). */
  def perceptualHash(df: DataFrame, idCol: Column, payloadCol: Column,
                     bits: Int = 60): DataFrame = {
    require(bits >= 1 && bits <= 62, "bits must fit a positive long")
    val base = df.select(idCol.as("doc_id"),
        lower(hex(payloadCol)).as("hx"))
      .filter(length(col("hx")) >= 4) // ≥ 2 bytes
      .withColumn("len", (length(col("hx")).cast("long") / 2).cast("long"))
    // one row per byte: (doc_id, cell, byte value); the explode is the
    // honest cost of content hashing (every byte read once) — rows never
    // carry the payload, only (id, j, bval) longs. The hex splits into
    // byte pairs with ONE \G-anchored regex pass per payload —
    // per-element substring(hx, k*2+1, 2) re-scans the string per byte
    // (UTF8String.substring is O(position)), i.e. O(len²) per payload:
    // the same inline-slice tax the round-10 shingle fix retired,
    // measured at 5.0 s of this gate's first sf0.1 sweep appearance.
    val bytes = base.select(col("doc_id"), col("len"),
        posexplode(split(col("hx"), "(?<=\\G..)")).as(Seq("k", "bhex")))
      .filter(length(col("bhex")) === 2) // trailing empty split token
      .select(col("doc_id"),
        // CAST(k AS BIGINT) first: posexplode's k is INT, so a bare
        // k * bits would multiply in 32-bit and silently wrap for
        // payloads past ~35 MB (k > Int.MaxValue / bits)
        expr(s"CAST(k AS BIGINT) * $bits div len").cast("int").as("j"),
        expr("CAST(conv(bhex, 16, 10) AS BIGINT)").as("bval"))
    val cells = bytes.groupBy(col("doc_id"), col("j"))
      .agg(sum(col("bval")).as("s"), count(lit(1)).as("n"))
    // per-payload totals as a window over the ≤ bits-row groups (never a
    // second pass over the byte explode)
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    cells
      .withColumn("ts", sum(col("s")).over(wDoc))
      .withColumn("tn", sum(col("n")).over(wDoc))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") * col("tn") > col("ts") * col("n"),
          expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(lit(0L)))
        .as("simhash"))
  }

  /** Expression-level metadata features — the cheap path that needs no
    * decode and stays inside whole-stage codegen: size, hash, magic-byte
    * prefix. Use before shuffling or routing payloads. */
  def payloadMeta(df: DataFrame, idCol: Column, payloadCol: Column): DataFrame =
    df.select(
      idCol.as("media_id"),
      length(payloadCol).cast("long").as("n_bytes"),
      md5(payloadCol).as("content_hash"),
      lower(hex(substring(payloadCol, 1, 8))).as("magic"))
}
