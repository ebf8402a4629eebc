package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100-TB warehouse layout claim, demonstrated (SURVEY.md §4): facts are
  * written partitioned by a date-derived column; a join against a filtered
  * dimension must then prune fact partitions at RUNTIME via dynamic
  * partition pruning (Spark inserts a subquery filter on the partition
  * column from the dim side), so a month-scoped analysis reads months, not
  * the whole fact table. */
class WarehouseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("date-partitioned fact + filtered dim join plans dynamic partition pruning") {
    val whDir = Files.createTempDirectory("graft_wh").toString

    // fact: orders partitioned by order month (the date-partitioned layout)
    Tables.orders(spark, TestSpark.sfDir)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("o_month")
      .parquet(s"$whDir/orders_by_month")
    val fact = spark.read.parquet(s"$whDir/orders_by_month")

    // dim: month attributes; the filter selects a handful of months
    val dim = fact.select(col("o_month").as("m")).distinct()
      .withColumn("is_peak", col("m").endsWith("-12"))
    val joined = fact
      .join(dim.filter(col("is_peak")), fact("o_month") === dim("m"))
      .groupBy("o_month").agg(count(lit(1)).as("n"))

    val rows = joined.collect()
    assert(rows.nonEmpty && rows.forall(_.getString(0).endsWith("-12")),
      "only December partitions should survive")

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in the fact scan:\n$plan")

    // static pruning sanity too: a literal partition predicate reaches the
    // scan as a PartitionFilter, reading one directory not the table
    val one = fact.filter(col("o_month") === "1995-06")
    val scanPlan = one.queryExecution.executedPlan.toString
    assert(scanPlan.contains("PartitionFilters"), s"no partition filters:\n$scanPlan")
    assert(one.count() > 0)
  }
}
