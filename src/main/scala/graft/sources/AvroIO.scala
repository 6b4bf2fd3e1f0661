package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Minimal Avro source/sink on the PUBLIC avro-core + Hadoop FS APIs —
  * the container ships `avro-1.12.1` but not the `spark-avro` datasource
  * module, so the write→read path is built directly: the reference
  * declares (dead) Avro serdes in its pom (pom.xml:79–93), and this
  * closes that last named format without smuggling in a dependency.
  *
  * Scale shape, not a driver loop:
  *  - `write` emits one `part-NNNNN.avro` per input partition from the
  *    EXECUTORS via `foreachPartition` + Hadoop `FileSystem.create` —
  *    the same sharded layout every Spark file sink uses; no collect,
  *    no single-file serialization point.
  *  - `read` parallelizes the part-file listing and each task streams
  *    its files through `DataFileStream` — schema-on-read against an
  *    explicit StructType (no inference pass), so the scan is one
  *    distributed map over files.
  *
  * Type surface: the scalar subset the engine's gates exchange (long,
  * int, double, float, boolean, string), nullable via avro unions —
  * extend the two converters to grow it. Not supported: nested records,
  * arrays, maps, logical types.
  */
object AvroIO {

  /** Avro record schema for a (scalar) StructType; every field is a
    * [null, T] union mirroring Spark's universal nullability. */
  def avroSchemaFor(schema: StructType, recordName: String): Schema = {
    def prim(dt: DataType): Schema.Type = dt match {
      case LongType    => Schema.Type.LONG
      case IntegerType => Schema.Type.INT
      case DoubleType  => Schema.Type.DOUBLE
      case FloatType   => Schema.Type.FLOAT
      case BooleanType => Schema.Type.BOOLEAN
      case StringType  => Schema.Type.STRING
      case other => throw new IllegalArgumentException(
        s"AvroIO supports scalar columns only, got ${other.simpleString}")
    }
    val fields = schema.fields.map { f =>
      val u = Schema.createUnion(
        List(Schema.create(Schema.Type.NULL), Schema.create(prim(f.dataType))).asJava)
      new Schema.Field(f.name, u, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(recordName, null, "graft.avro", false, fields.toList.asJava)
  }

  /** Write `df` as sharded Avro part files under `path` (overwrite). */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val avroJson = avroSchemaFor(sparkSchema, "row").toString
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    fs.delete(dir, true)
    fs.mkdirs(dir)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val avroSchema = new Schema.Parser().parse(avroJson)
        val out = new Path(path, f"part-$pid%05d.avro")
        val os = out.getFileSystem(new Configuration()).create(out, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
        w.create(avroSchema, os)
        try rows.foreach { row =>
          val rec = new GenericData.Record(avroSchema)
          var i = 0
          while (i < sparkSchema.length) {
            rec.put(i, row.get(i)) // scalar types map 1:1; null passes through
            i += 1
          }
          w.append(rec)
        } finally w.close() // closes the underlying stream
      }
    }
  }

  /** Read Avro part files under `path` against an explicit schema. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    val files = fs.listStatus(dir).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString)
    val parallelism = math.max(1, math.min(files.size,
      spark.sparkContext.defaultParallelism))
    val fileDs = spark.createDataset(files)(Encoders.STRING)
      .repartition(parallelism)
    val fieldTypes = schema.fields.map(_.dataType)
    val rows = fileDs.flatMap { file =>
      val p = new Path(file)
      val in = p.getFileSystem(new Configuration()).open(p)
      val reader = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      // iterator is consumed lazily per task; wrap to close at exhaustion
      new Iterator[Row] {
        private var closed = false
        def hasNext: Boolean = {
          val h = !closed && reader.hasNext
          if (!h && !closed) { reader.close(); closed = true }
          h
        }
        def next(): Row = {
          val rec = reader.next()
          Row.fromSeq(fieldTypes.indices.map { i =>
            (rec.get(i), fieldTypes(i)) match {
              case (null, _) => null
              case (v, StringType) => v.toString // Utf8 → String
              case (v, _) => v
            }
          })
        }
      }
    }(Encoders.row(schema))
    rows.toDF()
  }
}
