package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file interchange — the ROW-oriented format real
  * ingest pipelines hand an engine (Kafka topic dumps, warehouse CDC
  * exports, RPC logs are Avro long before anything is columnar).
  * Built directly on the Avro core library's container-file API
  * (`DataFileWriter`/`DataFileStream`, Apache Avro 1.12 — public
  * API), with the Spark side as plain distributed map work: the write
  * is one container file per upstream partition, the read is one task
  * per container file.
  *
  * Scale/pruning contract — honest for a row format: there is NO
  * predicate pushdown (no per-column min-max index exists in a row
  * container), but column PROJECTION is real: the read accepts a
  * projected READER schema and Avro's schema-resolution decoder
  * SKIPS non-projected fields at decode time (string/bytes skips are
  * length-hops, no allocation) — at 100 TB reading 2 of 12 columns
  * decodes 2, even though it still streams the bytes. That asymmetry
  * (vs Parquet/ORC which also skip the IO) is exactly why
  * [[graft.operators.Layout]] exists: Avro is the INGEST format; the
  * first job of a pipeline is converting it to a columnar layout.
  * Parallelism is file-granular (one Avro block-sync-aware split
  * reader is future work); writers should size partitions to the
  * 64–512 MB container sweet spot upstream.
  *
  * Type surface: the flat-analytics subset — BIGINT/INT/DOUBLE/FLOAT/
  * STRING/BOOLEAN/BINARY, arrays, and nested structs, nullable via
  * `union["null", T]`. Timestamps/dates/decimals/maps are rejected
  * loudly (convert upstream) rather than silently lossy.
  */
object Avro {

  /** Spark schema → Avro record schema. Nullable fields become
    * `union["null", T]`; names must already be Avro-legal
    * (`[A-Za-z0-9_]`, not starting with a digit).
    */
  def avroSchema(st: StructType, recordName: String = "row"): Schema = {
    val fields = st.fields.zipWithIndex.map { case (f, i) =>
      val t = fieldSchema(f.dataType, s"${recordName}_${f.name}")
      val sch = if (f.nullable)
        Schema.createUnion(java.util.List.of(
          Schema.create(Schema.Type.NULL), t))
      else t
      new Schema.Field(f.name, sch, null, null)
    }
    Schema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  private def fieldSchema(dt: DataType, nestedName: String): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case ArrayType(elem, containsNull) =>
      val e = fieldSchema(elem, nestedName + "_elem")
      Schema.createArray(if (containsNull)
        Schema.createUnion(java.util.List.of(
          Schema.create(Schema.Type.NULL), e))
      else e)
    case st: StructType => avroSchema(st, nestedName)
    case other => throw new IllegalArgumentException(
      s"Avro interchange does not support ${other.sql} — convert to the " +
        "long/int/double/float/string/boolean/binary/array/struct subset upstream")
  }

  /** Avro's resolved runtime values → Spark external Row values. */
  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (l: java.util.List[_], ArrayType(elem, _)) =>
      l.asScala.map(fromAvro(_, elem)).toSeq
    case (r: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.map(f => fromAvro(r.get(f.name), f.dataType)).toSeq)
    case (x, _) => x // long/int/double/float/boolean pass through
  }

  /** Spark external Row values → Avro runtime values. */
  private def toAvro(v: Any, dt: DataType, schema: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (s: scala.collection.Seq[_], ArrayType(elem, containsNull)) =>
      val arr = nonNull(schema) // array schema
      val es = arr.getElementType
      s.map(x => toAvro(x, elem, es)).asJava
    case (r: Row, st: StructType) => rowToRecord(r, st, nonNull(schema))
    case (x, _) => x
  }

  /** Strip the `["null", T]` nullable union down to T. */
  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  private def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      rec.put(f.name,
        toAvro(row.get(i), f.dataType, schema.getField(f.name).schema()))
      i += 1
    }
    rec
  }

  /** Write `df` as Avro container files under `path` (deflate codec):
    * one `part-NNNNN.avro` per non-empty upstream partition, plus a
    * `_schema.avsc` sidecar so readers (and empty datasets) never
    * need to open a data file to learn the schema. Distributed: each
    * task streams its partition straight into its container file —
    * nothing corpus-sized touches the driver.
    */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val schema = avroSchema(sparkSchema)
    val schemaJson = schema.toString
    // the SESSION's hadoop conf, not a fresh Configuration(): configured
    // filesystems (defaultFS, object-store credentials) must apply, and
    // Path.getFileSystem handles URI-special characters (spaces) that a
    // raw new URI(path) would reject
    val hadoopConf = df.sparkSession.sparkContext.hadoopConfiguration
    val serConf = new org.apache.spark.util.SerializableConfiguration(hadoopConf)
    val dir = new Path(path)
    val fs = dir.getFileSystem(hadoopConf)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, "_schema.avsc"))
    try out.write(schemaJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    df.rdd.mapPartitionsWithIndex { (i, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val taskSchema = new Schema.Parser().parse(schemaJson)
        val file = new Path(new Path(path), f"part-$i%05d.avro")
        val taskFs = file.getFileSystem(serConf.value)
        val w = new DataFileWriter(
          new GenericDatumWriter[GenericRecord](taskSchema))
          .setCodec(CodecFactory.deflateCodec(6))
          .create(taskSchema, taskFs.create(file))
        var n = 0L
        try rows.foreach { r =>
          w.append(rowToRecord(r, sparkSchema, taskSchema)); n += 1
        } finally w.close()
        Iterator.single(n)
      }
    }.count() // materialize the write
    ()
  }

  /** Spark StructType recovered from the `_schema.avsc` sidecar. */
  def sparkSchemaOf(spark: SparkSession, path: String): StructType = {
    val p = new Path(new Path(path), "_schema.avsc")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    structOf(new Schema.Parser().parse(json))
  }

  private def structOf(rec: Schema): StructType =
    StructType(rec.getFields.asScala.map { f =>
      val (s, nullable) = f.schema() match {
        case u if u.getType == Schema.Type.UNION => (nonNull(u), true)
        case s => (s, false)
      }
      StructField(f.name(), dataTypeOf(s), nullable)
    }.toSeq)

  private def dataTypeOf(s: Schema): DataType = s.getType match {
    case Schema.Type.LONG    => LongType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.ARRAY   => ArrayType(dataTypeOf(nonNull(s.getElementType)),
      s.getElementType.getType == Schema.Type.UNION)
    case Schema.Type.RECORD  => structOf(s)
    case other => throw new IllegalArgumentException(
      s"Avro interchange cannot map Avro type $other back to Spark")
  }

  /** Read an Avro dataset written by [[writeAvro]] (or any Avro
    * container files plus a `_schema.avsc` sidecar). `projection`
    * selects columns by name (order preserved); non-empty projection
    * builds a narrowed READER schema so Avro's resolving decoder
    * SKIPS the dropped fields at decode time — the row-format
    * equivalent of column pruning. One task per container file.
    */
  def readAvro(spark: SparkSession, path: String,
      projection: Seq[String] = Nil): DataFrame = {
    val full = sparkSchemaOf(spark, path)
    val schema =
      if (projection.isEmpty) full
      else StructType(projection.map(c => full.fields.find(_.name == c)
        .getOrElse(throw new IllegalArgumentException(
          s"projection column '$c' not in Avro schema " +
            s"(${full.fieldNames.mkString(", ")})"))))
    readAvroAs(spark, path, schema)
  }

  /** SCHEMA-EVOLUTION read: decode under an arbitrary evolved reader
    * schema — the Avro resolution rules the format was designed
    * around. Fields present in the writer decode normally (and may be
    * reordered or dropped = projection); fields ABSENT from the
    * writer must carry a `defaults` entry and are filled per record
    * by Avro's default-value resolution, so old container files read
    * seamlessly under the new pipeline schema with no rewrite — the
    * row-format twin of q108's parquet schema evolution. Scalar
    * defaults only (long/int/double/float/string/boolean, or null
    * for a nullable field); a missing-without-default field fails
    * loudly HERE rather than as a decoder error mid-task.
    */
  def readAvroAs(spark: SparkSession, path: String, schema: StructType,
      defaults: Map[String, Any] = Map.empty): DataFrame = {
    val writer = sparkSchemaOf(spark, path)
    val writerNames = writer.fieldNames.toSet
    val missing = schema.fields.filter(f =>
      !writerNames.contains(f.name) && !defaults.contains(f.name))
    require(missing.isEmpty,
      s"evolved fields ${missing.map(_.name).mkString(", ")} are not in " +
        "the written schema and have no default — reading would fail at " +
        "decode; pass defaults for added fields")
    val fields = schema.fields.map { f =>
      val base = fieldSchema(f.dataType, s"row_${f.name}")
      defaults.get(f.name) match {
        case None =>
          val sch = if (f.nullable)
            Schema.createUnion(java.util.List.of(
              Schema.create(Schema.Type.NULL), base))
          else base
          new Schema.Field(f.name, sch, null, null)
        case Some(null) =>
          require(f.nullable, s"null default for non-nullable ${f.name}")
          new Schema.Field(f.name,
            Schema.createUnion(java.util.List.of(
              Schema.create(Schema.Type.NULL), base)),
            null, Schema.Field.NULL_DEFAULT_VALUE)
        case Some(v) =>
          // non-null default: the default's branch must come FIRST in
          // the union (Avro's default-validation rule)
          val sch = if (f.nullable)
            Schema.createUnion(java.util.List.of(
              base, Schema.create(Schema.Type.NULL)))
          else base
          new Schema.Field(f.name, sch, null, v)
      }
    }
    val readerJson = Schema.createRecord("row", null, "graft", false,
      fields.toList.asJava).toString
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val serConf = new org.apache.spark.util.SerializableConfiguration(hadoopConf)
    val dir = new Path(path)
    val fs = dir.getFileSystem(hadoopConf)
    val files = fs.listStatus(dir)
      .map(_.getPath).filter(_.getName.endsWith(".avro"))
      .map(_.toString).sorted.toSeq
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { f =>
        val reader = new Schema.Parser().parse(readerJson)
        val p = new Path(f)
        val taskFs = p.getFileSystem(serConf.value)
        val stream = new DataFileStream(
          taskFs.open(p),
          new GenericDatumReader[GenericRecord](null, reader))
        // a downstream limit/take (or task failure) can abandon the
        // iterator before it drains — the completion listener closes
        // the handle either way; `closed` keeps the drain-time close
        // idempotent with it
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; stream.close() }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        new Iterator[Row] {
          def hasNext: Boolean = {
            if (closed) return false
            val h = stream.hasNext
            if (!h) closeOnce()
            h
          }
          def next(): Row = {
            val rec = stream.next()
            Row.fromSeq(schema.fields.map(fl =>
              fromAvro(rec.get(fl.name), fl.dataType)).toSeq)
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
