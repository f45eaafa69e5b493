package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

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

  /** `multimodal_meta` — payload byte length, content hash, and
    * stub-decoded (width, height, format) metadata. The metadata comes from
    * the REAL decode stage (`MediaDecode.withMetadata` — the per-partition
    * mapPartitions batch decoder), not a column-expression bypass, so the
    * decode plumbing itself is oracle-checked: the stub decoder derives
    * metadata from the payload's md5 top-60-bits (= `hash60`), which the
    * DuckDB oracle reproduces in SQL.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.docs(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    graft.operators.MediaDecode.withMetadata(base, "payload")
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        sha2(col("payload"), 256).as("content_hash"),
        col("media_meta.width").cast("long").as("width"),
        col("media_meta.height").cast("long").as("height"),
        col("media_meta.format").as("format"))
  }

  val multimodalMetaSql: String =
    s"""SELECT doc_id,
       |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       |       sha256(text) AS content_hash,
       |       ${Oracle.hash60("text")} % 1920 AS width,
       |       ${Oracle.hash60("text")} % 1080 AS height,
       |       CASE WHEN ${Oracle.hash60("text")} % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
       |FROM documents""".stripMargin

  val entries: Seq[(String, QueryDef)] = Seq(
    "multimodal_meta" -> QueryDef(multimodalMeta, Some(multimodalMetaSql)))
}
