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
}
