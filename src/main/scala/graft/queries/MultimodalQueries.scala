package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column surface in the correctness gate. The testdata has no
  * real media, so document text bytes stand in as the opaque payload —
  * which exercises the identical plumbing (binary column in, per-payload
  * features out). `multimodal_meta` covers the codegen'd expression-level
  * path; `multimodal_frames` oracle-checks the typed mapPartitions path
  * itself (frame sampling); decode/resize internals are in MultimodalSpec.
  */
object MultimodalQueries {

  private val multimodalMeta: Q = (s, dir) =>
    Multimodal.payloadMeta(
      Tables.documents(s, dir).withColumn("payload", col("text").cast("binary")),
      col("doc_id"), col("payload"))

  private val multimodalMetaSql =
    """SELECT doc_id AS media_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       md5(text) AS content_hash,
      |       lower(left(hex(encode(text)), 16)) AS magic
      |FROM documents""".stripMargin

  // ── frame sampling through the REAL mapPartitions path ─────────────────
  // 64-byte frames, every 2nd kept; emitted as hex so the oracle can slice
  // the same bytes (DuckDB lacks BLOB substring — both sides slice the hex
  // string representation, 128 hex chars per 64-byte frame).
  private val multimodalFrames: Q = (s, dir) => {
    import s.implicits._
    val media = Tables.documents(s, dir).select(
      col("doc_id").as("media_id"), lit("video").as("media_type"),
      col("text").cast("binary").as("payload"),
      map().cast("map<string,string>").as("meta")).as[Multimodal.MediaRecord]
    Multimodal.frameSample(media, frameBytes = 64, stride = 2).toDF()
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        lower(hex(col("frame"))).as("frame_hex"))
  }

  private val multimodalFramesSql =
    """WITH h AS (SELECT doc_id AS media_id, lower(hex(encode(text))) AS hx
      |           FROM documents),
      |i AS (SELECT media_id, hx,
      |             unnest(range(0, CAST(ceil(length(hx) / 128.0) AS INT))) AS idx
      |      FROM h)
      |SELECT media_id, CAST(idx AS BIGINT) AS frame_idx,
      |       substring(hx, idx * 128 + 1, 128) AS frame_hex
      |FROM i WHERE idx % 2 = 0""".stripMargin

  // ── the full media chain: frame-sample → resize → featurize ────────────
  // All three mapPartitions stages composed (the 1→N generator, the 1→1
  // bounded-size transform, the decode/featurize), value-checked end to
  // end: the oracle recomputes every stage arithmetically over the hex
  // representation — strided byte keep (step = ceil(len/16)), unsigned
  // byte-sum checksum, and the fake decoder's derived dimensions.
  // Frame identity survives featurize (whose contract is one id per
  // media object) by packing media_id·1000 + frame_idx — safe here,
  // frame counts are ≤ ~40 per document.
  private def pipelineWith(decoder: Multimodal.Decoder): Q = (s, dir) => {
    import s.implicits._
    val media = Tables.documents(s, dir).select(
      col("doc_id").as("media_id"), lit("video").as("media_type"),
      col("text").cast("binary").as("payload"),
      map().cast("map<string,string>").as("meta")).as[Multimodal.MediaRecord]
    val resized = Multimodal.resizeStub(
      Multimodal.frameSample(media, frameBytes = 64, stride = 2), targetBytes = 16)
    val feats = Multimodal.featurize(resized.map { f =>
      // loud guard, not a silent wrap: frame_idx >= 1000 would alias two
      // frames onto one packed id and silently corrupt BOTH unpacked
      // columns downstream (a >128 KB document at 64-byte frames,
      // stride 2). The fixture's max is ~40; widen the factor (both here
      // and in the div/% unpack and the oracle) before raising the cap.
      require(f.frame_idx < 1000L,
        s"frame packing overflow: media ${f.media_id} frame ${f.frame_idx} >= 1000")
      Multimodal.MediaRecord(f.media_id * 1000L + f.frame_idx, "video", f.frame,
        Map.empty[String, String])
    }, decoder)
    feats.toDF().select(
      expr("media_id div 1000").as("media_id"),
      (col("media_id") % 1000).cast("long").as("frame_idx"),
      col("n_bytes"), col("checksum"),
      col("width").cast("long").as("width"),
      col("height").cast("long").as("height"),
      col("frames").cast("long").as("frames"))
  }

  private val multimodalPipeline: Q = pipelineWith(Multimodal.Decoder.fake)

  /** The same chain under the SECOND decoder (byte histogram) — only the
    * decoder argument differs, proving the pipeline is decoder-agnostic;
    * the oracle recomputes histogram features (distinct byte values,
    * modal frequency, smallest byte) over the same resized frames. */
  private val multimodalPipelineHist: Q =
    pipelineWith(Multimodal.Decoder.byteHistogram)

  private val multimodalPipelineSql =
    """WITH h AS (SELECT doc_id AS media_id, lower(hex(encode(text))) AS hx
      |           FROM documents),
      |i AS (SELECT media_id, hx,
      |             unnest(range(0, CAST(ceil(length(hx) / 128.0) AS INT))) AS idx
      |      FROM h),
      |fr AS (SELECT media_id, idx AS frame_idx, substring(hx, idx * 128 + 1, 128) AS fhex
      |       FROM i WHERE idx % 2 = 0),
      |rz AS (SELECT media_id, frame_idx,
      |              string_agg(substring(fhex, j * step * 2 + 1, 2), '' ORDER BY j) AS rhex
      |       FROM (SELECT media_id, frame_idx, fhex,
      |                    CAST(ceil((length(fhex) // 2) / 16.0) AS INT) AS step,
      |                    unnest(range(0, CAST(ceil((length(fhex) // 2)
      |                      / ceil((length(fhex) // 2) / 16.0)) AS INT))) AS j
      |             FROM fr)
      |       GROUP BY 1, 2),
      |cs AS (SELECT media_id, frame_idx, length(rhex) // 2 AS n_bytes,
      |              sum(CAST(('0x' || substring(rhex, k * 2 + 1, 2)) AS BIGINT)) AS checksum
      |       FROM (SELECT media_id, frame_idx, rhex,
      |                    unnest(range(0, CAST(length(rhex) // 2 AS INT))) AS k
      |             FROM rz)
      |       GROUP BY 1, 2, rhex)
      |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |       CAST(n_bytes AS BIGINT) AS n_bytes,
      |       CAST(checksum AS BIGINT) AS checksum,
      |       CAST(16 + checksum % 64 AS BIGINT) AS width,
      |       CAST(16 + (checksum // 64) % 64 AS BIGINT) AS height,
      |       CAST(1 + n_bytes % 30 AS BIGINT) AS frames
      |FROM cs""".stripMargin

  private val multimodalPipelineHistSql =
    """WITH h AS (SELECT doc_id AS media_id, lower(hex(encode(text))) AS hx
      |           FROM documents),
      |i AS (SELECT media_id, hx,
      |             unnest(range(0, CAST(ceil(length(hx) / 128.0) AS INT))) AS idx
      |      FROM h),
      |fr AS (SELECT media_id, idx AS frame_idx, substring(hx, idx * 128 + 1, 128) AS fhex
      |       FROM i WHERE idx % 2 = 0),
      |rz AS (SELECT media_id, frame_idx,
      |              string_agg(substring(fhex, j * step * 2 + 1, 2), '' ORDER BY j) AS rhex
      |       FROM (SELECT media_id, frame_idx, fhex,
      |                    CAST(ceil((length(fhex) // 2) / 16.0) AS INT) AS step,
      |                    unnest(range(0, CAST(ceil((length(fhex) // 2)
      |                      / ceil((length(fhex) // 2) / 16.0)) AS INT))) AS j
      |             FROM fr)
      |       GROUP BY 1, 2),
      |freq AS (SELECT media_id, frame_idx, sub, count(*) AS cnt
      |         FROM (SELECT media_id, frame_idx,
      |                      substring(rhex, k * 2 + 1, 2) AS sub
      |               FROM (SELECT media_id, frame_idx, rhex,
      |                            unnest(range(0, CAST(length(rhex) // 2 AS INT))) AS k
      |                     FROM rz))
      |         GROUP BY 1, 2, 3),
      |bh AS (SELECT media_id, frame_idx,
      |              sum(cnt) AS n_bytes, count(*) AS distinct_bytes,
      |              max(cnt) AS max_freq,
      |              min(CAST(('0x' || sub) AS BIGINT)) AS min_byte
      |       FROM freq GROUP BY 1, 2)
      |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |       CAST(n_bytes AS BIGINT) AS n_bytes,
      |       CAST(distinct_bytes AS BIGINT) AS checksum,
      |       CAST(16 + max_freq % 64 AS BIGINT) AS width,
      |       CAST(16 + min_byte % 64 AS BIGINT) AS height,
      |       CAST(1 + distinct_bytes % 30 AS BIGINT) AS frames
      |FROM bh""".stripMargin

  // ── perceptual-hash near-dup dedup over payload BYTES ──────────────────
  // The dedup modality the text/embedding families don't cover: two media
  // payloads that differ at the byte level (re-encode jitter, a corrupted
  // byte) but share content. Pipeline: aHash-style 60-bit perceptual hash
  // (Multimodal.perceptualHash — position-sensitive cell means, exact
  // integer bit rule) → the SAME banded pigeonhole pair miner the text
  // family uses (DedupOps.simHashBandedPairs, 4×15 bands cover Hamming
  // ≤ 3, candidates via band equi-joins — NEVER all-pairs) → keep-min
  // drop rule. Two planted perturbation kinds ride the fixture payloads,
  // both id-offset far above any ScaleGen replica range (10¹²/2·10¹²)
  // and classified by construction, not threshold:
  //   swaps: first two bytes exchanged — same cell, hash-IDENTICAL by
  //          construction (hamming 0), so detection is guaranteed;
  //   tweaks: first byte forced to 0xff — one cell's mean moves, flipping
  //          only margin-thin bits (the realistic near-miss population).
  // Output: every dropped payload with its kept canonical and the pair's
  // hamming (packed min over (d1, hamming) for a deterministic pick).
  private val multimodalNearDedup: Q = (s, dir) => {
    import graft.operators.DedupOps
    val base = Tables.documents(s, dir).select(
      col("doc_id").as("media_id"),
      lower(hex(col("text").cast("binary"))).as("hx"))
    val swaps = base
      .filter(col("media_id") % 20 === 0 && length(col("hx")) >= 122)
      .select((col("media_id") + lit(1000000000000L)).as("media_id"),
        concat(expr("substring(hx, 3, 2)"), expr("substring(hx, 1, 2)"),
          expr("substring(hx, 5)")).as("hx"))
    val tweaks = base
      .filter(col("media_id") % 20 === 7 && length(col("hx")) >= 4)
      .select((col("media_id") + lit(2000000000000L)).as("media_id"),
        concat(lit("ff"), expr("substring(hx, 3)")).as("hx"))
    val media = base.unionByName(swaps).unionByName(tweaks)
    // FanOut the payload kernel (hex/aHash per byte ran at the scan's
    // 3-task parallelism); checkpoint the hash relation — it is
    // (media_id, simhash) = 16 B/row metadata, and the banded candidate
    // generator's per-band self-joins otherwise re-run the whole
    // perceptual-hash kernel per band side (Profile r15: one 0.87 s
    // stage dominating the 1.8 s gate)
    val ph = Multimodal.perceptualHash(
      graft.operators.FanOut.bySize(media, col("media_id")),
      col("media_id"), unhex(col("hx")), bits = 60)
      .localCheckpoint()
    val pairs = DedupOps.simHashBandedPairs(ph, bands = 4, maxDist = 3, bits = 60)
    pairs.groupBy(col("d2").as("media_id"))
      .agg(min(col("d1") * 1000 + col("hamming")).as("kfp"))
      .select(col("media_id"), expr("kfp div 1000").as("kept_as"),
        (col("kfp") % 1000).cast("long").as("hamming"))
  }

  // quadratic reference oracle (bit-replay of the hash, then ALL pairs —
  // fine at gate scale; the engine side is the banded plan)
  private val multimodalNearDedupSql =
    """WITH base AS (SELECT doc_id AS media_id, lower(hex(encode(text))) AS hx
      |              FROM documents),
      |pl AS (
      |  SELECT media_id + 1000000000000 AS media_id,
      |         substring(hx, 3, 2) || substring(hx, 1, 2) || substring(hx, 5) AS hx
      |  FROM base WHERE media_id % 20 = 0 AND length(hx) >= 122
      |  UNION ALL
      |  SELECT media_id + 2000000000000 AS media_id,
      |         'ff' || substring(hx, 3) AS hx
      |  FROM base WHERE media_id % 20 = 7 AND length(hx) >= 4),
      |media AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
      |bytes AS (
      |  SELECT media_id, (k * 60) // (length(hx) // 2) AS j,
      |         CAST(('0x' || substring(hx, k * 2 + 1, 2)) AS BIGINT) AS bval
      |  FROM (SELECT media_id, hx, unnest(range(0, length(hx) // 2)) AS k
      |        FROM media WHERE length(hx) >= 4)),
      |cells AS (SELECT media_id, j, sum(bval) AS s, count(*) AS n
      |          FROM bytes GROUP BY 1, 2),
      |tot AS (SELECT media_id, sum(s) AS ts, sum(n) AS tn
      |        FROM cells GROUP BY 1),
      |ph AS (SELECT c.media_id,
      |              CAST(sum(CASE WHEN c.s * t.tn > t.ts * c.n
      |                            THEN (CAST(1 AS BIGINT) << c.j)
      |                            ELSE 0 END) AS BIGINT) AS simhash
      |       FROM cells c JOIN tot t USING (media_id) GROUP BY 1),
      |pairs AS (SELECT a.media_id AS d1, b.media_id AS d2,
      |                 bit_count(xor(a.simhash, b.simhash)) AS hamming
      |          FROM ph a JOIN ph b ON a.media_id < b.media_id
      |          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)
      |SELECT d2 AS media_id,
      |       CAST(min(d1 * 1000 + hamming) // 1000 AS BIGINT) AS kept_as,
      |       CAST(min(d1 * 1000 + hamming) % 1000 AS BIGINT) AS hamming
      |FROM pairs GROUP BY 1""".stripMargin

  val all: Map[String, Q] = Map(
    "multimodal_meta"          -> multimodalMeta,
    "multimodal_frames"        -> multimodalFrames,
    "multimodal_pipeline"      -> multimodalPipeline,
    "multimodal_pipeline_hist" -> multimodalPipelineHist,
    "multimodal_near_dedup"    -> multimodalNearDedup)
  val oracles: Map[String, String] = Map(
    "multimodal_meta"          -> multimodalMetaSql,
    "multimodal_frames"        -> multimodalFramesSql,
    "multimodal_pipeline"      -> multimodalPipelineSql,
    "multimodal_pipeline_hist" -> multimodalPipelineHistSql,
    "multimodal_near_dedup"    -> multimodalNearDedupSql)
}
