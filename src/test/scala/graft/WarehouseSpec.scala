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

  test("compaction collapses a fragmented dataset without changing its rows") {
    val dir = Files.createTempDirectory("graft_compact").resolve("frag").toString
    val orders = Tables.orders(spark, TestSpark.sfDir)
    orders.repartition(64).write.mode("overwrite").parquet(dir)
    def parquetFiles =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles === 64, "fixture should start fragmented")
    val before = spark.read.parquet(dir).orderBy("o_orderkey").collect()

    val written = graft.etl.Warehouse.compact(spark, dir, targetMB = 128)
    assert(written === 1 && parquetFiles === 1,
      s"small dataset should compact to one ~targetMB file, got $parquetFiles")
    val after = spark.read.parquet(dir).orderBy("o_orderkey").collect()
    assert(after.toSeq === before.toSeq, "compaction must be a pure rewrite")
  }

  test("bucketed tables co-locate the join: sort-merge with zero shuffle exchanges") {
    // The 100-TB co-located-join layout: both sides bucketed (and sorted) on
    // the join key at write time, so a key-equi join needs NO shuffle at
    // read time — the per-bucket files already agree on the partitioning.
    Tables.orders(spark, TestSpark.sfDir)
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    Tables.customer(spark, TestSpark.sfDir)
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join must pick a partitioned strategy
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_name")
      assert(j.count() > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan did not report bucketed read:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
