package graft.sources

import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.GenericRecord
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat}
import org.apache.avro.util.Utf8
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file ingest — the one mainstream warehouse wire format
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
