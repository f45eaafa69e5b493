package graft.sources

import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.avro.util.Utf8
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file ingest + export — the one mainstream warehouse wire format
  * Spark's bundled sources don't cover in this environment (the
  * `spark-avro` connector module isn't on the classpath; avro core +
  * avro-mapred are). Built the way a connector is: Hadoop's splittable
  * `AvroKeyInputFormat` feeds the distributed scan — Avro container files
  * split on block sync markers, so a 100 TB delivery fans out across
  * executors exactly like parquet — and each partition decodes records
  * straight to `Row`s against an explicit READER schema.
  *
  * The reader schema is derived from the caller's `StructType`, which buys
  * the two scan disciplines the rest of the engine gets from Catalyst:
  *
  *  - **No inference pass**: like the CSV/JSONL probes, the schema is
  *    explicit — Avro carries its writer schema in the file header, so
  *    there is no inference SCAN to pay, but pinning the reader schema
  *    also pins the TYPES the pipeline may assume (the SchemaContractSpec
  *    discipline).
  *  - **Decode-level projection**: Avro is row-major, so column pruning
  *    cannot skip I/O the way parquet does — but Avro's resolving decoder
  *    SKIPS (not materializes) every writer field absent from the reader
  *    schema, which is the cheapest projection a row format admits. Ask
  *    for 2 of 40 fields and 38 are skipped at the byte level per record.
  *
  * Schema evolution follows Avro resolution rules: every reader field is a
  * `["null", T]` union with default null, so a field missing from the
  * writer schema surfaces as NULL (the additive-evolution contract), and a
  * writer's non-null `T` resolves into the union. Flat record schemas of
  * the warehouse primitive types are supported — the same surface the
  * CSV/JSONL probes pin.
  *
  * Conversion happens inside the scan's own iterator, before any shuffle:
  * Hadoop record readers REUSE the key object, so each `AvroKey` is
  * converted to an immutable `Row` at pull time and never buffered.
  */
object AvroSource {

  /** Read `path` (a file or directory of `.avro` container files) as a
    * DataFrame with exactly `schema`'s columns and types.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, toAvroSchema(schema, "graft_avro_row"))
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      job.getConfiguration)
    val fields = schema.fields
    val rows = rdd.mapPartitions { it =>
      it.map { case (key, _) =>
        val rec = key.datum()
        Row.fromSeq(fields.toIndexedSeq.map(f => fromAvro(rec.get(f.name), f.dataType)))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Write `df` to `path` as Avro container files — the export half of
    * the ingest path above, closing the round trip (a delivery this
    * engine writes must be re-ingestable by [[read]] and by any Avro
    * consumer). Distributed the way the scan is: one container file per
    * partition through Hadoop's `AvroKeyOutputFormat`, each with the
    * block sync markers that make it SPLITTABLE on re-ingest — no
    * driver-side funnel, no `coalesce(1)`; a 1000-partition DataFrame
    * writes 1000 files in parallel exactly like the parquet sink.
    *
    * The writer schema is derived from `df.schema` by the same
    * [[toAvroSchema]] mapping the reader uses (every field a
    * `["null", T]` union), so written files resolve against any reader
    * schema this source accepts and the flat-schema boundary is enforced
    * symmetrically — a nested/array column fails FAST with the pointed
    * unsupported-type error, at plan time on the driver, not per-task.
    *
    * Row→record conversion happens per partition inside the write tasks;
    * strings pass as String (Avro encodes CharSequence), binary re-wraps
    * as ByteBuffer. The Avro schema is shipped to executors as its JSON
    * string (`Schema` itself is not serializable).
    */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val avroSchema = toAvroSchema(sparkSchema, "graft_avro_row") // fails fast on non-flat types
    val schemaJson = avroSchema.toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, avroSchema)
    val fields = sparkSchema.fields
    df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fields.length) {
          rec.put(fields(i).name,
            if (row.isNullAt(i)) null else toAvro(row.get(i), fields(i).dataType))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Encode one Spark external value as the Avro datum for `dt`. */
  private[graft] def toAvro(v: Any, dt: DataType): AnyRef = (v, dt) match {
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (other, _) => other.asInstanceOf[AnyRef]
  }

  /** The reader schema for a flat StructType: a record of
    * `["null", T]`-union fields (default null), so missing writer fields
    * read as NULL and non-null writer fields resolve into the union.
    */
  private[graft] def toAvroSchema(schema: StructType, name: String): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case StringType => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"AvroSource: unsupported field type $other for '${f.name}' — " +
            "flat warehouse primitives only (long/int/double/float/string/" +
            "boolean/binary)")
      }
      val union = Schema.createUnion(Schema.create(Schema.Type.NULL), base)
      fields.add(new Schema.Field(f.name, union,
        s"graft reader field ${f.name}", Schema.Field.NULL_DEFAULT_VALUE))
    }
    Schema.createRecord(name, "graft avro reader schema", "graft.sources",
      false, fields)
  }

  /** Decode one Avro datum to the Spark external type for `dt`. */
  private[graft] def fromAvro(v: AnyRef, dt: DataType): Any = v match {
    case null => null
    case u: Utf8 => u.toString
    case s: String => s
    case b: ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case i: java.lang.Integer if dt == LongType => i.longValue()
    case f: java.lang.Float if dt == DoubleType => f.doubleValue()
    case other => other
  }
}
