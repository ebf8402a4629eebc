package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev probe (not a test): does pinHashPartitioned suppress the
  * exchange on the pinned side of a keyed join, and does the join produce
  * the same rows as the unpartitioned plan? */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = spark.range(1000).select((col("id") % 100).as("src"), (col("id") % 7).as("dst"))
    val pinned = graft.queries.Exprs.pinHashPartitioned(edges, "src")
    println("=== pinned logical ===")
    println(pinned.queryExecution.optimizedPlan.toString)
    val frontier = spark.range(5000).select((col("id") % 500).as("src"), lit(1L).as("label"))
      .localCheckpoint(true)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = pinned.join(frontier, "src").groupBy("dst").agg(min("label"), count(lit(1)).as("n"))
    val got = j.collect().map(_.toString).sorted.toSeq
    println("=== join executed ===")
    println(j.queryExecution.executedPlan.toString)
    // correctness: same result as the undeclared plan
    val ref = edges.join(frontier, "src").groupBy("dst")
      .agg(min("label"), count(lit(1)).as("n")).collect().map(_.toString).sorted.toSeq
    println(s"MATCH=${got == ref} rows=${got.size}")
    spark.stop()
  }
}
