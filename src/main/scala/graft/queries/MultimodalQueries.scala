package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal-column surface in the correctness gate. The testdata has no
  * real media, so document text bytes stand in as the opaque payload —
  * which exercises the identical plumbing (binary column in, per-payload
  * features out). The mapPartitions decode path is covered in
  * MultimodalSpec; this query covers the codegen'd expression-level path.
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

  val all: Map[String, Q] = Map("multimodal_meta" -> multimodalMeta)
  val oracles: Map[String, String] = Map("multimodal_meta" -> multimodalMetaSql)
}
