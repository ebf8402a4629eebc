package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** XML ingest (SURVEY.md §1.1): the CustomerMgmt.xml shape — nested
  * `<TPCDI:Action>` elements wrapping customer/account/contact structures —
  * via Spark 4's built-in XML data source (no external spark-xml needed).
  *
  * Element attributes surface as `_AttrName` columns; nested elements become
  * `StructType` columns, so downstream code uses ordinary column paths
  * (`$"Customer._C_ID"`). The source is splittable by rowTag at scale.
  */
object XmlSource {

  def read(spark: SparkSession, path: String, rowTag: String,
           schema: Option[StructType] = None): DataFrame = {
    val reader = spark.read.format("xml").option("rowTag", rowTag)
    schema.fold(reader)(reader.schema).load(path)
  }

  /** [[read]] with REJECT CAPTURE — the XML twin of
    * [[JsonSource.readWithRejects]]: records that fail to parse against the
    * explicit schema surface with the raw record text in `_reject`
    * (PERMISSIVE corrupt-record semantics) instead of silently loading as
    * nulls. Callers split on `_reject IS NULL` exactly as with CSV/JSON.
    * Schema is REQUIRED here: reject capture is meaningless under inference
    * (inference adapts the schema to the malformation instead of flagging
    * it). */
  def readWithRejects(spark: SparkSession, path: String, rowTag: String,
                      schema: StructType): DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_reject")
      .schema(schema.add("_reject", org.apache.spark.sql.types.StringType))
      .load(path)
}
