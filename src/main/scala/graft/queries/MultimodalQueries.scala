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

  val all: Map[String, Q] = Map(
    "multimodal_meta"   -> multimodalMeta,
    "multimodal_frames" -> multimodalFrames)
  val oracles: Map[String, String] = Map(
    "multimodal_meta"   -> multimodalMetaSql,
    "multimodal_frames" -> multimodalFramesSql)
}
