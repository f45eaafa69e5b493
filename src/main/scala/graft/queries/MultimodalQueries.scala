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

  /** `media_framesample` — the FRAME-SAMPLE stage of a video pipeline:
    * every payload explodes into its stride-2 sampled frames with a
    * per-frame fingerprint (the feature-extract placeholder), through the
    * REAL per-partition streaming flatMap stage
    * (`MediaDecode.frameSample`) — frames never buffer as a per-row
    * array, the shape that matters when one payload is a 2-hour video.
    * Frame count and fingerprints are pure functions of the payload
    * bytes, so the mapPartitions stage is oracle-checked end-to-end.
    */
  val FrameStride = 2

  def mediaFramesample(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.docs(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    graft.operators.MediaDecode.frameSample(base, "payload", FrameStride)
      .select(col("doc_id"), col("frame_idx"), col("frame_fp"))
  }

  val mediaFramesampleSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, md5(text) AS h,
       |         unnest(generate_series(0, octet_length(CAST(text AS BLOB)) // ${graft.operators.MediaDecode.FrameBytes}, $FrameStride)) AS i
       |  FROM documents)
       |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
       |       ${Oracle.hash60("h || ':' || CAST(i AS VARCHAR)")} AS frame_fp
       |FROM f""".stripMargin

  /** `media_resize` — the RESIZE/thumbnail stage: payloads above
    * [[ResizeBytes]] truncate to the stub thumbnail, smaller ones pass
    * through untouched (the skip-if-small fast path), all via the real
    * per-partition batch stage (`MediaDecode.withResized`). Emits the
    * before/after byte sizes, a was-resized flag, and the content hash of
    * the RESIZED payload — pure functions of the input bytes, so the
    * stage is oracle-checked end-to-end like the decode and frame-sample
    * stages.
    */
  val ResizeBytes = 256

  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.docs(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    graft.operators.MediaDecode.withResized(base, "payload", ResizeBytes)
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("orig_bytes"),
        octet_length(col("resized")).cast("long").as("resized_bytes"),
        (octet_length(col("payload")) > lit(ResizeBytes)).as("was_resized"),
        // hash the HEX encoding of the resized bytes: DuckDB has no BLOB
        // slicing, but hex() is byte-aligned (2 chars/byte), so
        // left(hex(payload), 2·target) is exactly hex(resized) — the
        // oracle checks the stage's output bytes through the encoding
        sha2(lower(hex(col("resized"))), 256).as("resized_hash"))
  }

  val mediaResizeSql: String =
    s"""SELECT doc_id,
       |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS orig_bytes,
       |       CAST(least(octet_length(CAST(text AS BLOB)), $ResizeBytes) AS BIGINT) AS resized_bytes,
       |       octet_length(CAST(text AS BLOB)) > $ResizeBytes AS was_resized,
       |       sha256(lower(left(hex(CAST(text AS BLOB)), ${2 * ResizeBytes}))) AS resized_hash
       |FROM documents""".stripMargin

  val entries: Seq[(String, QueryDef)] = Seq(
    "multimodal_meta" -> QueryDef(multimodalMeta, Some(multimodalMetaSql)),
    "media_framesample" -> QueryDef(mediaFramesample, Some(mediaFramesampleSql)),
    "media_resize" -> QueryDef(mediaResize, Some(mediaResizeSql)))
}
