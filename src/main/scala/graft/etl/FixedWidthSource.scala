package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}

/** Fixed-width text ingest (SURVEY.md §2.1 `q_scan_fixedwidth`): the FINWIRE
  * family — multi-record-type files where a type tag at a fixed offset
  * (`CMP`/`SEC`/`FIN`) selects the layout for the rest of the line.
  *
  * Implementation is pure column expressions over `spark.read.text`:
  * `substring` slices stay inside whole-stage codegen, values are trimmed
  * (fixed-width fields are space-padded) and cast per the layout. Reading
  * the file once and branching per record type with filters means one scan
  * feeds all layouts (Spark caches nothing here by default; callers doing
  * all three branches at scale should `.persist()` the tagged lines).
  */
object FixedWidthSource {

  /** One field of a fixed-width layout: 1-based start offset, byte length. */
  final case class FieldSpec(name: String, start: Int, len: Int,
                             dataType: DataType = StringType)

  private def slice(f: FieldSpec): Column =
    trim(substring(col("value"), f.start, f.len)).cast(f.dataType).as(f.name)

  /** Read a single-layout fixed-width file. */
  def read(spark: SparkSession, path: String, fields: Seq[FieldSpec]): DataFrame =
    spark.read.text(path).select(fields.map(slice): _*)

  /** [[read]] with REJECT CAPTURE — the DImessages-style channel the CSV
    * and JSON sources already carry ([[DelimitedSource.readWithRejects]],
    * [[JsonSource.readWithRejects]]): a line is rejected when it is SHORTER
    * than the layout extent (a truncated record would silently slice empty
    * suffix fields) or when a typed field's non-empty slice fails its cast
    * (`"12x4" → null` under non-ANSI cast would otherwise load as a silent
    * null). Rejected rows surface with the raw line in `_reject` and their
    * data columns as parsed-so-far; callers split on `_reject IS NULL`
    * exactly as with the other sources. Pure codegen column expressions —
    * the validation adds no second scan. */
  def readWithRejects(spark: SparkSession, path: String,
                      fields: Seq[FieldSpec]): DataFrame =
    spark.read.text(path)
      .select(fields.map(tolerantSlice) :+
        when(rejectCond(fields), col("value")).as("_reject"): _*)

  /** `try_cast` slice — under ANSI mode (Spark 4 default) a plain cast
    * THROWS on a malformed field, killing the whole batch for one bad
    * line; the reject reader must stay tolerant so the bad line lands in
    * `_reject` instead. The strict [[read]]/[[readTyped]] paths keep the
    * fail-fast ANSI cast. */
  private def tolerantSlice(f: FieldSpec): Column =
    expr(s"try_cast(trim(substring(value, ${f.start}, ${f.len})) " +
      s"AS ${f.dataType.sql})").as(f.name)

  private def rejectCond(fields: Seq[FieldSpec]): Column = {
    val extent = fields.map(f => f.start + f.len - 1).max
    val castFail = fields.filter(_.dataType != StringType)
      .map { f =>
        val raw = trim(substring(col("value"), f.start, f.len))
        raw =!= "" &&
          expr(s"try_cast(trim(substring(value, ${f.start}, ${f.len})) " +
            s"AS ${f.dataType.sql})").isNull
      }
      .foldLeft(lit(false))(_ || _)
    length(col("value")) < extent || castFail
  }

  /** Read a multi-record-type file: the tag at (typeStart, typeLen) picks the
    * layout; returns one DataFrame per declared record type, each sliced with
    * its own layout (the FINWIRE CMP/SEC/FIN dispatch). */
  def readTyped(spark: SparkSession, path: String, typeStart: Int, typeLen: Int,
                layouts: Map[String, Seq[FieldSpec]]): Map[String, DataFrame] = {
    val lines = spark.read.text(path)
      .withColumn("rec_type", trim(substring(col("value"), typeStart, typeLen)))
    layouts.map { case (tag, fields) =>
      tag -> lines.filter(col("rec_type") === tag).select(fields.map(slice): _*)
    }
  }

  /** [[readTyped]] with reject capture: per-type frames gain the same
    * `_reject` validation as [[readWithRejects]], and lines whose tag
    * matches NO declared layout — which [[readTyped]] silently drops —
    * come back under the `"_unknown"` key with the raw line in `_reject`
    * (and a `rec_type` column), so an ingest batch can account for every
    * input line. */
  def readTypedWithRejects(spark: SparkSession, path: String, typeStart: Int,
                           typeLen: Int, layouts: Map[String, Seq[FieldSpec]])
      : Map[String, DataFrame] = {
    val lines = spark.read.text(path)
      .withColumn("rec_type", trim(substring(col("value"), typeStart, typeLen)))
    val typed = layouts.map { case (tag, fields) =>
      tag -> lines.filter(col("rec_type") === tag)
        .select(fields.map(tolerantSlice) :+
          when(rejectCond(fields), col("value")).as("_reject"): _*)
    }
    val known = layouts.keys.toSeq
    typed + ("_unknown" -> lines.filter(!col("rec_type").isInCollection(known))
      .select(col("rec_type"), col("value").as("_reject")))
  }
}
