package graft.etl

import java.io.File
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink (SURVEY.md §2.1) — the one mainstream
  * interchange format the engine had no row for. The distribution ships
  * only the avro CORE jars (no `spark-avro` DataSource module), so this is
  * a hand-rolled connector over `DataFileReader`/`DataFileWriter`:
  *
  *  - READ: one Spark task per `.avro` container file — the natural Avro
  *    parallelism unit (files are splittable at sync-marker granularity;
  *    per-file tasks are the right grain until single files exceed task
  *    size, at which point the upstream writer should roll files). The
  *    schema is read ONCE on the driver from one file header; rows convert
  *    per partition with zero driver involvement.
  *  - WRITE: one container file per partition (`part-NNNNN.avro`), written
  *    executor-side; the parallelism and file-count story is exactly the
  *    parquet writer's.
  *
  * Type surface: the flat interchange subset — boolean/int/long/float/
  * double/string/bytes, each nullable via the idiomatic `[null, T]` union.
  * Nested records/arrays/maps and logical types are out of scope for the
  * TPC-DI-shaped flat tables this engine ingests; a reader hitting one
  * fails loudly with the field name rather than mis-decoding.
  *
  * Deployment note: file IO goes through `java.io.File` (this repo's
  * local-FS persistence, same as the manifest layers). An object-store
  * deployment would swap in `FileSystem.open`/`create` streams behind the
  * same per-file task structure — or adopt the upstream `spark-avro`
  * DataSource when the module is available; the row conversion and schema
  * mapping here are the same work that module does. */
object AvroSource {

  /** Avro record schema for a flat Spark schema (nullable → [null, T]). */
  private[graft] def toAvroSchema(st: StructType, name: String): Schema = {
    val fields = SchemaBuilder.record(name).namespace("graft").fields()
    st.fields.foldLeft(fields) { (fs, f) =>
      val base = f.dataType match {
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType    => Schema.create(Schema.Type.LONG)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"AvroSource: unsupported Spark type $other for field ${f.name} " +
            "(flat interchange subset: boolean/int/long/float/double/string/binary)")
      }
      if (f.nullable)
        fs.name(f.name)
          .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
          .withDefault(null)
      else fs.name(f.name).`type`(base).noDefault()
    }.endRecord()
  }

  /** Spark schema for a flat Avro record schema. */
  private[etl] def toSparkSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"AvroSource: top-level Avro schema must be a record, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (base, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val branches = f.schema().getTypes.asScala
          val nonNull = branches.filter(_.getType != Schema.Type.NULL)
          require(nonNull.size == 1 && branches.size <= 2,
            s"AvroSource: field ${f.name} has a non-nullable-union schema " +
              s"${f.schema()} — only [null, T] unions are supported")
          (nonNull.head, true)
        case _ => (f.schema(), false)
      }
      val dt = base.getType match {
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.INT     => IntegerType
        case Schema.Type.LONG    => LongType
        case Schema.Type.FLOAT   => FloatType
        case Schema.Type.DOUBLE  => DoubleType
        case Schema.Type.STRING  => StringType
        case Schema.Type.BYTES   => BinaryType
        case other => throw new IllegalArgumentException(
          s"AvroSource: unsupported Avro type $other for field ${f.name}")
      }
      StructField(f.name, dt, nullable)
    })
  }

  private def toSpark(v: AnyRef): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case s: CharSequence => s.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case x => x
  }

  private def toAvro(v: Any): AnyRef = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case x => x.asInstanceOf[AnyRef]
  }

  /** All `.avro` container files under `path` (or `path` itself if it is
    * one), sorted for deterministic partition numbering. */
  private def listAvroFiles(path: String): Seq[String] = {
    val p = Paths.get(path)
    val files =
      if (Files.isRegularFile(p)) Seq(p)
      else {
        val s = Files.walk(p)
        try s.iterator().asScala.filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".avro")).toSeq
        finally s.close()
      }
    require(files.nonEmpty, s"AvroSource: no .avro files under $path")
    files.map(_.toString).sorted
  }

  /** Read an Avro container table: schema from one header (driver-side
    * metadata only), then one task per file. Heals a writer's crashed
    * swap first (path absent, retired `.old-*` tree complete — the
    * [[Compaction.recoverInterrupted]] contract [[writeAvro]] shares). */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    Compaction.recoverInterrupted(path)
    val files = listAvroFiles(path)
    val header = new DataFileReader[GenericRecord](
      new File(files.head), new GenericDatumReader[GenericRecord]())
    val avroJson = try header.getSchema.toString finally header.close()
    val sparkSchema = toSparkSchema(new Schema.Parser().parse(avroJson))
    val n = sparkSchema.fields.length
    val rows = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { file =>
        // per-task reader; re-parse the schema executor-side (Schema is not
        // serializable-stable across avro versions; JSON is)
        val reader = new DataFileReader[GenericRecord](
          new File(file), new GenericDatumReader[GenericRecord]())
        // close on task completion, not on iterator exhaustion — a limit/
        // take or a mid-iteration failure never drains the iterator, and
        // an fd per file per bounded query leaks until GC otherwise
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => reader.close()))
        val expected = reader.getSchema.toString
        if (expected != avroJson)
          throw new IllegalStateException(
            s"AvroSource: $file carries a different schema than the table's " +
              "first file — mixed-schema directories are not supported")
        new Iterator[Row] {
          def hasNext: Boolean = reader.hasNext
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq((0 until n).map(i => toSpark(rec.get(i))))
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** Write a DataFrame as an Avro container table with OVERWRITE semantics
    * and crash atomicity: the job lands in a write-aside directory, and
    * only a COMPLETE job swaps into `path` (retire old → move new → delete
    * retired — the [[Compaction]] swap pattern, healed by the shared
    * [[Compaction.recoverInterrupted]] if a writer dies mid-swap). A task
    * or job failure therefore leaves the prior table fully intact — never
    * a half-deleted, half-written directory a reader would silently serve.
    * An empty input yields a READABLE empty table (one zero-record
    * container file carrying the schema), matching the parquet sinks.
    * Returns the number of container files written. */
  def writeAvro(df: DataFrame, path: String,
                recordName: String = "graft_record"): Int = {
    val sparkSchema = df.schema
    val avroJson = toAvroSchema(sparkSchema, recordName).toString
    // heal a predecessor's crashed swap, then reclaim its leftover
    // write-aside / retired trees (reclaimOrphans runs the heal first)
    Compaction.reclaimOrphans(path)
    def newWriter(schema: Schema, file: File): DataFileWriter[GenericRecord] = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
      w.create(schema, file)
      w
    }
    val tmp = path + ".compact-" + java.util.UUID.randomUUID() // reclaimed like a compaction orphan
    Files.createDirectories(Paths.get(tmp))
    val written = df.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(avroJson)
        val writer = newWriter(schema, new File(f"$tmp/part-$idx%05d.avro"))
        try it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < sparkSchema.fields.length) {
            rec.put(i, toAvro(row.get(i))); i += 1
          }
          writer.append(rec)
        } finally writer.close()
        Iterator.single(1)
      }
    }.sum().toInt
    if (written == 0)
      newWriter(new Schema.Parser().parse(avroJson),
        new File(s"$tmp/part-00000.avro")).close()
    // swap the complete rewrite into place; replacing the WHOLE directory
    // is what makes overwrite semantics airtight (no stale file at any
    // depth can survive into the next read)
    if (Files.exists(Paths.get(path))) {
      val old = Paths.get(path + ".old-" + java.util.UUID.randomUUID())
      Files.move(Paths.get(path), old)
      Files.move(Paths.get(tmp), Paths.get(path))
      Compaction.deleteRecursively(old)
    } else {
      Option(Paths.get(path).toAbsolutePath.getParent)
        .foreach(Files.createDirectories(_))
      Files.move(Paths.get(tmp), Paths.get(path))
    }
    math.max(written, 1)
  }
}
