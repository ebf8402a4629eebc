package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-lines ingest (SURVEY.md §2.1): the semi-structured landing-zone
  * format. Schema is always explicit — inference is a second full scan at
  * 100 TB and drifts types between batches — and malformed lines surface
  * through the same DImessages-style reject channel as
  * [[DelimitedSource.readWithRejects]], so one bad producer record never
  * fails (or silently shrinks) an ingest batch. Line-oriented and
  * splittable: byte-range parallelism works because each record is one
  * line. */
object JsonSource {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** [[read]] with REJECT CAPTURE: lines that fail to parse against the
    * schema come back as rows whose `_reject` column holds the raw line
    * (PERMISSIVE corrupt-record semantics — data fields that parsed before
    * the failure may be non-null; classify by `_reject`, never by data-field
    * nullness). Callers split `_reject IS NULL` into the load path and
    * route the rest to the error table.
    *
    * Spark quirk: a query whose referenced columns are ONLY the
    * corrupt-record column of a raw JSON scan is disallowed
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the load/
    * error-table writes reference every column so the production path is
    * unaffected, but ad-hoc reject counts must materialize first. */
  def readWithRejects(spark: SparkSession, path: String,
                      schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_reject", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_reject")
      .json(path)
}
