package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Delimited-text ingest (SURVEY.md §2.1 `q_scan_csv`): TPC-DI's Trade.txt /
  * CashTransaction.txt / incremental Customer.txt family — header-less,
  * pipe- or comma-separated, schema mandated by the spec. Schema inference
  * is never viable on header-less files, so the schema is always explicit.
  *
  * At scale this is a splittable line-oriented scan: Spark parallelizes by
  * HDFS-style byte ranges, so one big text file still fans out across the
  * cluster; the explicit schema keeps the parser single-pass (no inference
  * scan) and `columnNameOfCorruptRecord` captures reject rows instead of
  * failing the batch (DImessages-style error handling).
  */
object DelimitedSource {

  /** Timestamp format written/read by [[write]]/[[read]] round-trips —
    * pinned so ingest is byte-stable regardless of Spark defaults. */
  val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** The one shared option block: [[read]] and [[readWithRejects]] MUST
    * parse identically (a format fix reaching only one path would turn
    * clean rows into spurious rejects, or vice versa). */
  private def reader(spark: SparkSession, schema: StructType, sep: String) =
    spark.read
      .schema(schema)
      .option("sep", sep)
      .option("header", "false")
      .option("timestampNTZFormat", TsFormat)
      .option("timestampFormat", TsFormat)
      .option("mode", "PERMISSIVE")

  def read(spark: SparkSession, path: String, schema: StructType,
           sep: String = "|"): DataFrame =
    reader(spark, schema, sep).csv(path)

  /** [[read]] with REJECT CAPTURE — the DImessages-style error channel:
    * malformed lines surface as rows whose `_reject` column carries the raw
    * line instead of failing the batch or silently nulling. (PERMISSIVE
    * semantics: fields parsed BEFORE the failure point are kept, only the
    * failed-and-later ones are null — classify rows by `_reject`, never by
    * data-field nullness.) Callers split `_reject IS NULL` into the load
    * path and route the rest to the error table. Parsing stays single-pass
    * and splittable; the corrupt-record column is Spark's native
    * PERMISSIVE-mode channel, not a second validation scan. */
  def readWithRejects(spark: SparkSession, path: String, schema: StructType,
                      sep: String = "|"): DataFrame =
    reader(spark,
        schema.add("_reject", org.apache.spark.sql.types.StringType), sep)
      .option("columnNameOfCorruptRecord", "_reject")
      .csv(path)

  /** Inverse of [[read]] for round-trip tests and warehouse extracts. */
  def write(df: DataFrame, path: String, sep: String = "|"): Unit =
    df.write
      .option("sep", sep)
      .option("header", "false")
      .option("timestampNTZFormat", TsFormat)
      .option("timestampFormat", TsFormat)
      .mode("overwrite")
      .csv(path)
}
