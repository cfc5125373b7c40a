package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** A15: Avro container-file SOURCE + SINK built directly on the Avro core
  * library (`avro-1.12` ships in Spark's own jars; the `spark-avro`
  * DataSource module does NOT, so a from-scratch engine on this runtime
  * must speak the format itself). Avro is the row-oriented half of the
  * lakehouse at-rest pair (Kafka payloads, ingestion landing zones,
  * schema-registry pipelines) next to parquet/ORC's columnar half — the
  * reference's ingestion path would land exactly this shape before
  * compaction.
  *
  * Scale design:
  *   - WRITE: one Avro container file per partition, written by the
  *     EXECUTORS through the task's Hadoop FileSystem (HDFS/S3A in a
  *     cluster, local FS here) — the driver never sees a row; deflate
  *     codec; schema embedded per container (self-describing at rest).
  *   - READ: `binaryFiles` distributes whole containers (Avro's sync
  *     markers support finer splits; whole-file granularity is the
  *     landing-zone regime where files are bounded by the writer above);
  *     each executor streams records through `DataFileStream` — O(1)
  *     memory per reader. The Spark schema is recovered from the FIRST
  *     container's embedded schema (one driver-side header read, no
  *     full-file scan, no inference over data).
  *   - TYPES: the nullable-union scalar set the star corpus uses
  *     (long/int/double/float/boolean/string/binary). Timestamps travel
  *     as explicit epoch columns chosen by the caller — same convention
  *     as the CSV round-trip (a12).
  *
  * SourcesSpec asserts write→read row fidelity per type;
  * `a15_avro_roundtrip` puts the hop under the DuckDB hash gate (oracle
  * reads the original parquet — lossless round-trip means the format hop
  * is invisible).
  */
object AvroSource {

  /** Spark → Avro schema: a record of nullable unions. */
  def toAvroSchema(schema: StructType, name: String = "graft_record"): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"unsupported Avro round-trip type: $other (land timestamps as epoch columns)")
    }
    val fields = schema.fields.map { f =>
      new Schema.Field(f.name,
        Schema.createUnion(Schema.create(Schema.Type.NULL), prim(f.dataType)),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft", false, fields.toSeq.asJava)
  }

  /** Avro record schema → Spark schema (the inverse, for self-describing
    * reads; unwraps nullable unions).
    */
  def toSparkSchema(avro: Schema): StructType = {
    def unwrap(s: Schema): Schema =
      if (s.getType == Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
      else s
    def dt(s: Schema): DataType = unwrap(s).getType match {
      case Schema.Type.LONG    => LongType
      case Schema.Type.INT     => IntegerType
      case Schema.Type.DOUBLE  => DoubleType
      case Schema.Type.FLOAT   => FloatType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.STRING  => StringType
      case Schema.Type.BYTES   => BinaryType
      case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
    }
    StructType(avro.getFields.asScala.map(f =>
      StructField(f.name(), dt(f.schema()), nullable = true)).toSeq)
  }

  /** Write `df` as one Avro container per partition under `dir`
    * (executor-side, through the task's Hadoop FileSystem).
    */
  def write(df: DataFrame, dir: String): Unit = {
    val sparkSchema = df.schema
    val avroJson = toAvroSchema(sparkSchema).toString
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      val schema = new Schema.Parser().parse(avroJson)
      val path = new org.apache.hadoop.fs.Path(dir, f"part-$i%05d.avro")
      val fs = path.getFileSystem(hadoopConf.value)
      val out = fs.create(path, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      writer.create(schema, out)
      var n = 0L
      rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var j = 0
        while (j < sparkSchema.length) {
          val v = row.get(j) match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case other => other
          }
          rec.put(j, v)
          j += 1
        }
        writer.append(rec)
        n += 1
      }
      writer.close()
      Iterator.single(n)
    }.count(): Unit
  }

  /** Read every Avro container under `dir` into a DataFrame whose schema
    * comes from the first container's embedded writer schema.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    // one bounded driver-side header read for the schema
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val first = fs.globStatus(new org.apache.hadoop.fs.Path(dir, "*.avro"))
      .headOption.getOrElse(throw new IllegalArgumentException(s"no .avro in $dir"))
    val headStream = new DataFileStream[GenericRecord](
      fs.open(first.getPath), new GenericDatumReader[GenericRecord]())
    val avroJson = try headStream.getSchema.toString finally headStream.close()
    val sparkSchema = toSparkSchema(new Schema.Parser().parse(avroJson))

    val rows = spark.sparkContext
      .binaryFiles(s"$dir/*.avro")
      .flatMap { case (_, pds) =>
        val in = new DataFileStream[GenericRecord](
          pds.open(), new GenericDatumReader[GenericRecord]())
        val localSchema = sparkSchema // serialized once per task
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = in.hasNext
            if (!h) in.close()
            h
          }
          override def next(): Row = {
            val rec = in.next()
            Row.fromSeq(localSchema.fields.indices.map { j =>
              rec.get(j) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case bb: java.nio.ByteBuffer =>
                  val b = new Array[Byte](bb.remaining()); bb.get(b); b
                case v => v
              }
            })
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
