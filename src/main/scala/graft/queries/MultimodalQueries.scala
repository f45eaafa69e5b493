package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata extracted by a decode stage.
  *
  * The container has no image/audio codecs, so the decoder
  * (`graft.operators.MediaDecode`) is a clearly-marked deterministic stub —
  * but the Spark-side plumbing (binary schema, per-partition batch decode,
  * metadata struct) is real and tested. This query runs the pipeline with
  * the documents' text bytes standing in for media payloads.
  */
object MultimodalQueries {

  /** `multimodal_meta` — payload byte length, content hash, and stub-decoded
    * (width, height) metadata derived deterministically from the content
    * hash. Oracle-checkable end-to-end because the stub decode is a pure
    * function of the payload bytes.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val payload = col("text").cast("binary")
    val h = TextFns.hash60(col("text"))
    Tables.docs(spark, dir).select(
      col("doc_id"),
      octet_length(payload).cast("long").as("n_bytes"),
      sha2(payload, 256).as("content_hash"),
      (h % 1920).as("width"),
      (h % 1080).as("height"))
  }

  val multimodalMetaSql: String =
    s"""SELECT doc_id,
       |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       |       sha256(text) AS content_hash,
       |       ${Oracle.hash60("text")} % 1920 AS width,
       |       ${Oracle.hash60("text")} % 1080 AS height
       |FROM documents""".stripMargin

  val entries: Seq[(String, QueryDef)] = Seq(
    "multimodal_meta" -> QueryDef(multimodalMeta, Some(multimodalMetaSql)))
}
