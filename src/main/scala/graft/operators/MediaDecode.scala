package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Multimodal decode stage: opaque `binary` media payloads → typed metadata.
  *
  * The decode itself is a STUB — this container ships no image/audio
  * codecs, so `decodeStub` derives deterministic fake metadata from the
  * payload bytes. Everything around it is the real Spark plumbing a media
  * pipeline needs at 100 TB:
  *   - payloads stay `BinaryType` columns (never strings) end-to-end;
  *   - decode runs once per partition via `mapPartitions`, amortizing
  *     per-batch decoder setup (the JVM-side equivalent of a Pandas UDF
  *     over `mapInPandas` batches);
  *   - output schema is the input schema + a typed metadata struct, so
  *     downstream stages (resize, frame-sample, feature-extract) compose as
  *     further columns.
  */
object MediaDecode {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB decoder — deterministic fake: replace with a real codec binding
    * (e.g. TwelveMonkeys/javacv) in deployment. Pure function of the bytes:
    * metadata derives from the payload's 60-bit md5 prefix (the same
    * `hash60` the text kernels use — first 15 md5 hex digits as an
    * integer), so the DuckDB oracle reproduces the decode exactly and the
    * whole mapPartitions stage sits on the CORRECTNESS path.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, String) = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
    val pos = h >>> 4 // top 60 bits = hash60(payload), always non-negative
    ((pos % 1920).toInt, (pos % 1080).toInt, if (pos % 2 == 0) "png" else "jpeg")
  }

  /** Append a `media_meta` struct decoded from `payloadCol`. Per-partition
    * batching: the (stub) decoder is instantiated once per partition, not
    * once per row. NULL payloads decode to a NULL struct (the field is
    * nullable), matching SQL NULL propagation — md5(NULL) IS NULL in the
    * DuckDB oracle — instead of NPEing the task.
    */
  def withMetadata(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema.add(StructField("media_meta", metaSchema, nullable = true))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition decoder setup would go here (open codec context once)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val meta =
          if (payload == null) null
          else { val (w, h, f) = decodeStub(payload); Row(w, h, f) }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** Bytes per stub "frame": a payload of n bytes decodes to
    * `1 + n / FrameBytes` frames.
    */
  val FrameBytes = 64

  private def md5Hex(payload: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    d.map(b => f"$b%02x").mkString
  }

  /** Top-60-bits md5 hash of a string — the JVM mirror of the text
    * kernels' `hash60` (first 15 md5 hex digits as an integer), so the
    * DuckDB oracle reproduces frame fingerprints exactly.
    */
  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var j = 0
    while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
    h >>> 4
  }

  /** RESIZE stage: append a `resized` binary column — the stub "thumbnail"
    * is the payload truncated to `targetBytes` (a real deployment decodes,
    * scales, and re-encodes here; the byte-truncation stand-in keeps the
    * stage a pure function of the input bytes so it sits on the
    * oracle-checked CORRECTNESS path). Payloads already at or under the
    * target pass through UNCHANGED (same object, no copy) — the
    * skip-if-small fast path a real thumbnailer needs at 100 TB, where
    * most assets are already small. Per-partition batching as in
    * [[withMetadata]]; NULL payloads resize to NULL.
    */
  def withResized(df: DataFrame, payloadCol: String, targetBytes: Int): DataFrame = {
    val schema = df.schema.add(StructField("resized", BinaryType, nullable = true))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition codec context would initialize here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val resized =
          if (payload == null) null
          else if (payload.length <= targetBytes) payload
          else java.util.Arrays.copyOfRange(payload, 0, targetBytes)
        Row.fromSeq(r.toSeq :+ resized)
      }
    }(enc)
  }

  /** FRAME-SAMPLE stage: each payload row explodes into every `stride`-th
    * frame of its stub-decoded frame sequence, with a per-frame
    * fingerprint (the feature-extract placeholder — a real deployment
    * puts the decoded-frame embedding here). Emits the input columns plus
    * `(frame_idx, frame_fp)`.
    *
    * The frame count (`1 + bytes/FrameBytes`) and fingerprint
    * (`hash60(md5hex(payload) ':' frame_idx)`) are pure functions of the
    * bytes, so the whole stage sits on the oracle-checked CORRECTNESS
    * path like [[withMetadata]]. Frames STREAM out of the flatMap one at
    * a time (no per-row frame array is materialized — a long video would
    * otherwise buffer its whole frame list in one row), and the decoder
    * context is per-partition. NULL payloads emit no frames.
    */
  def frameSample(df: DataFrame, payloadCol: String, stride: Int): DataFrame = {
    val schema = df.schema
      .add(StructField("frame_idx", LongType, nullable = false))
      .add(StructField("frame_fp", LongType, nullable = false))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition decoder setup would go here (open codec context once)
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](idx)
        if (payload == null) Iterator.empty
        else {
          val nFrames = 1 + payload.length / FrameBytes
          val base = md5Hex(payload)
          Iterator.range(0, nFrames, stride).map { f =>
            Row.fromSeq(r.toSeq :+ f.toLong :+ hash60(s"$base:$f"))
          }
        }
      }
    }(enc)
  }
}
