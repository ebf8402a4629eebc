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
}
