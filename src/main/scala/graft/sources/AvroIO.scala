package graft.sources

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro source/sink on the PUBLIC avro-core + Hadoop FS APIs — the
  * container ships `avro-1.12.1` but not the `spark-avro` datasource
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
  *    distributed map over files. Fields resolve BY NAME against each
  *    file's writer schema (never by position — a schema evolution that
  *    reorders columns must not silently transpose values), and the
  *    stream is closed by a task-completion listener even when the
  *    consumer stops early (limit/take).
  *
  * Type surface: scalars (long, int, double, float, boolean, string,
  * binary), timestamps (Avro `timestamp-micros` logical type — Spark's
  * native micros precision), dates (`date` logical type, epoch days),
  * decimals (`decimal` logical type over bytes — unscaled two's-
  * complement big-endian, read back at the requested Spark scale; fixed-
  * backed decimals are accepted on read), arrays, nested records, and
  * string-keyed maps, all nullable via [null, T] unions mirroring
  * Spark's universal nullability. Avro-only wire types Spark's type
  * system can't name — ENUM and FIXED — are written via per-field
  * schema OVERRIDES (`write(df, path, overrides)`: a string field may
  * be declared enum, a binary field fixed) and read back as
  * string/binary. Not supported (throws at schema build):
  * calendar-interval and non-string map keys.
  */
object AvroIO {

  /** Avro schema for a Spark DataType. Nested record types need unique
    * Avro names — derived from the enclosing field path. */
  private def avroTypeFor(dt: DataType, path: String): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case dt: DecimalType =>
      LogicalTypes.decimal(dt.precision, dt.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, containsNull) =>
      val elem = avroTypeFor(et, s"${path}_item")
      Schema.createArray(if (containsNull) nullable(elem) else elem)
    case st: StructType => recordFor(st, path, Map.empty)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = avroTypeFor(vt, s"${path}_value")
      Schema.createMap(if (valueContainsNull) nullable(v) else v)
    case other => throw new IllegalArgumentException(
      s"AvroIO cannot encode ${other.simpleString} (field path: $path)")
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(List(Schema.create(Schema.Type.NULL), s).asJava)

  /** Wire-type override validity: which Spark type carries which
    * Avro-only schema. Enum travels as string, fixed as binary (or a
    * fixed-backed decimal). Anything else is a schema authoring error —
    * caught here, at build time, not mid-write on an executor. */
  private def overrideCompatible(dt: DataType, s: Schema): Boolean =
    (dt, s.getType) match {
      case (StringType, Schema.Type.ENUM)    => true
      case (BinaryType, Schema.Type.FIXED)   => true
      case (_: DecimalType, Schema.Type.FIXED) =>
        s.getLogicalType.isInstanceOf[LogicalTypes.Decimal]
      case _ => false
    }

  private def recordFor(schema: StructType, recordName: String,
                        overrides: Map[String, Schema]): Schema = {
    val fields = schema.fields.map { f =>
      val t = overrides.get(f.name) match {
        case Some(o) =>
          require(overrideCompatible(f.dataType, o),
            s"override for '${f.name}' (${o.getType}) incompatible with ${f.dataType.simpleString}")
          o
        case None => avroTypeFor(f.dataType, s"${recordName}_${f.name}")
      }
      new Schema.Field(f.name, nullable(t),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(recordName, null, "graft.avro", false, fields.toList.asJava)
  }

  /** Avro record schema for a StructType; every field is a [null, T]
    * union mirroring Spark's universal nullability. `overrides` maps a
    * TOP-LEVEL field name to an explicit Avro wire schema (enum for a
    * string field, fixed for a binary field) for the Avro-only types
    * Spark's type system can't express. */
  def avroSchemaFor(schema: StructType, recordName: String,
                    overrides: Map[String, Schema] = Map.empty): Schema =
    recordFor(schema, recordName, overrides)

  /** Non-null union branch of a field schema (fields are [null, T]). */
  private def branch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  /** Spark external value → Avro datum, recursively. `target` is the
    * (possibly union) Avro schema of the destination field. */
  private def toAvro(v: Any, dt: DataType, target: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (ts: java.sql.Timestamp, TimestampType) =>
      // epoch micros; getTime's millis already include nanos/10⁶, so
      // rebuild from (floorDiv seconds, nanos) to stay exact pre-1970
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    case (i: java.time.Instant, TimestampType) =>
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
    case (bd: java.math.BigDecimal, dt: DecimalType) =>
      // unscaled two's-complement big-endian at the declared scale —
      // the Avro decimal logical-type wire contract
      java.nio.ByteBuffer.wrap(
        bd.setScale(dt.scale).unscaledValue().toByteArray)
    case (str: String, StringType) if branch(target).getType == Schema.Type.ENUM =>
      new GenericData.EnumSymbol(branch(target), str)
    case (b: Array[Byte], BinaryType) if branch(target).getType == Schema.Type.FIXED =>
      new GenericData.Fixed(branch(target), b)
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
      val elemSchema = branch(branch(target).getElementType)
      seq.map(toAvro(_, et, elemSchema)).asJava
    case (row: Row, st: StructType) =>
      val recSchema = branch(target)
      val rec = new GenericData.Record(recSchema)
      var i = 0
      while (i < st.length) {
        rec.put(st.fields(i).name,
          toAvro(row.get(i), st.fields(i).dataType,
            recSchema.getField(st.fields(i).name).schema()))
        i += 1
      }
      rec
    case (m: scala.collection.Map[_, _], MapType(StringType, vt, _)) =>
      val valSchema = branch(branch(target).getValueType)
      m.map { case (k, mv) => k.toString -> toAvro(mv, vt, valSchema) }.asJava
    case (other, _) => other // scalar types map 1:1
  }

  /** Avro datum → Spark external value, recursively. Record fields
    * resolve BY NAME against the datum's own (writer) schema. */
  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s, StringType) => s.toString // Utf8 → String
    case (micros: java.lang.Long, TimestampType) =>
      val m = micros.longValue()
      val ts = new java.sql.Timestamp(Math.floorDiv(m, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(m, 1000000L) * 1000L).toInt)
      ts
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.longValue()))
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
    case (bb: java.nio.ByteBuffer, dt: DecimalType) =>
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr)
      new java.math.BigDecimal(new java.math.BigInteger(arr), dt.scale)
    case (fx: org.apache.avro.generic.GenericFixed, BinaryType) =>
      fx.bytes().clone()
    case (fx: org.apache.avro.generic.GenericFixed, dt: DecimalType) =>
      new java.math.BigDecimal(new java.math.BigInteger(fx.bytes()), dt.scale)
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      l.asScala.toSeq.map(fromAvro(_, et))
    case (rec: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.toSeq.map { f =>
        val wf = rec.getSchema.getField(f.name)
        require(wf != null,
          s"Avro record is missing field '${f.name}' (writer schema: ${rec.getSchema.getFields.asScala.map(_.name).mkString(", ")})")
        fromAvro(rec.get(wf.pos()), f.dataType)
      })
    case (m: java.util.Map[_, _], MapType(StringType, vt, _)) =>
      m.asScala.map { case (k, mv) => k.toString -> fromAvro(mv, vt) }.toMap
    case (other, _) => other
  }

  /** Write `df` as sharded Avro part files under `path` (overwrite).
    * `schemaOverrides` declares Avro-only wire types per top-level field
    * (enum for string, fixed for binary / decimal) — see `avroSchemaFor`;
    * field ORDER always follows the Spark schema, so the positional row
    * loop below stays valid with or without overrides. */
  def write(df: DataFrame, path: String,
            schemaOverrides: Map[String, Schema] = Map.empty): Unit = {
    val sparkSchema = df.schema
    val avroJson = avroSchemaFor(sparkSchema, "row", schemaOverrides).toString
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
        // self-authored schema: field i of the record IS spark field i,
        // so the row loop is positional; schemas hoisted out of the loop
        val fieldSchemas = sparkSchema.fields.map(f =>
          avroSchema.getField(f.name).schema())
        try rows.foreach { row =>
          val rec = new GenericData.Record(avroSchema)
          var i = 0
          while (i < sparkSchema.length) {
            rec.put(i,
              toAvro(row.get(i), sparkSchema.fields(i).dataType, fieldSchemas(i)))
            i += 1
          }
          w.append(rec)
        } finally w.close() // closes the underlying stream
      }
    }
  }

  /** Read Avro part files under `path` against an explicit schema.
    * Requested fields are resolved by NAME against each file's writer
    * schema (missing field → loud error, never positional transposition);
    * extra writer fields are ignored (projection). */
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
    val fields = schema.fields
    val rows = fileDs.flatMap { file =>
      val p = new Path(file)
      val in = p.getFileSystem(new Configuration()).open(p)
      val reader = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; reader.close() }
      // a limit/take may abandon the iterator before exhaustion — the
      // completion listener closes the HDFS stream either way
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeOnce())
      // resolve each requested field ONCE per file against the writer
      // schema — by name, failing loudly on a missing column
      val writerSchema = reader.getSchema
      val positions = fields.map { f =>
        val wf = writerSchema.getField(f.name)
        require(wf != null,
          s"$file has no field '${f.name}' (writer schema: ${writerSchema.getFields.asScala.map(_.name).mkString(", ")})")
        wf.pos()
      }
      new Iterator[Row] {
        def hasNext: Boolean = {
          val h = !closed && reader.hasNext
          if (!h) closeOnce()
          h
        }
        def next(): Row = {
          val rec = reader.next()
          Row.fromSeq(fields.indices.map { i =>
            fromAvro(rec.get(positions(i)), fields(i).dataType)
          })
        }
      }
    }(Encoders.row(schema))
    rows.toDF()
  }
}
