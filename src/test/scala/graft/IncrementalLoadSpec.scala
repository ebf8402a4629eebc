package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{DelimitedSource, IncrementalLoad}

/** End-to-end TPC-DI incremental updates: pipe-delimited CDC batch files
  * (FIXTURES.md §B cdc_customer shape) ingested with an explicit schema and
  * folded into the customer snapshot batch by batch — the Batches 2–3 flow
  * of the benchmark, through the same DelimitedSource + Scd2 pieces the
  * historical load uses. */
class IncrementalLoadSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val cdcSchema = StructType(Seq(
    StructField("cdc_flag", StringType),
    StructField("cdc_dsn", LongType),
    StructField("c_id", LongType),
    StructField("c_name", StringType),
    StructField("c_tier", IntegerType)))

  private def writeBatch(name: String, lines: Seq[String]): String = {
    val p = Files.createTempDirectory(s"graft_cdc_$name")
    Files.write(p.resolve(s"$name.txt"), lines.mkString("\n").getBytes)
    p.toString
  }

  test("CDC batches fold into the snapshot: latest wins, deletes remove") {
    val snapshot = Seq(
      (1L, "Smith", 2), (2L, "Jones", 1), (3L, "Brown", 3))
      .toDF("c_id", "c_name", "c_tier")

    // batch 2: update customer 1 twice (seq 11 then 12 — 12 must win),
    // insert customer 4, delete customer 2
    val b2 = writeBatch("b2", Seq(
      "U|11|1|Smith-A|2",
      "U|12|1|Smith-B|3",
      "I|13|4|New|1",
      "D|14|2||"))
    // batch 3: delete customer 4 (inserted in batch 2), update customer 3
    val b3 = writeBatch("b3", Seq(
      "D|21|4||",
      "U|22|3|Brown-2|4"))

    val batches = Seq(
      "batch2" -> DelimitedSource.read(spark, b2, cdcSchema),
      "batch3" -> DelimitedSource.read(spark, b3, cdcSchema))

    val (finalState, reports) =
      IncrementalLoad.run(snapshot, batches, keyCols = Seq("c_id"))

    val rows = finalState.orderBy("c_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.toSeq === Seq(
      (1L, "Smith-B", 3), // latest update in batch 2 won
      (3L, "Brown-2", 4)  // updated in batch 3
    ), s"unexpected final snapshot: ${rows.toSeq}")
    // customers 2 and 4 are deleted; 4 existed only between the batches

    assert(reports === Seq(
      IncrementalLoad.BatchReport("batch2", 4, 3, 1),
      IncrementalLoad.BatchReport("batch3", 2, 1, 1)))
  }

  test("runAudited: same fold as run, plus exact post-fold state bookkeeping") {
    val snapshot = Seq(
      (1L, "Smith", 2), (2L, "Jones", 1), (3L, "Brown", 3))
      .toDF("c_id", "c_name", "c_tier")
    val batches = Seq(
      "b2" -> Seq(
        ("U", 11L, 1L, "Smith-A", 2), ("U", 12L, 1L, "Smith-B", 3),
        ("I", 13L, 4L, "New", 1), ("D", 14L, 2L, "", 0))
        .toDF("cdc_flag", "cdc_dsn", "c_id", "c_name", "c_tier"),
      "b3" -> Seq(("D", 21L, 4L, "", 0), ("U", 22L, 3L, "Brown-2", 4))
        .toDF("cdc_flag", "cdc_dsn", "c_id", "c_name", "c_tier"))
    val (state, reports) = IncrementalLoad.runAudited(
      snapshot, batches, Seq("c_id"), checksumCol = "c_id")
    assert(state.orderBy("c_id").collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(reports === Seq(
      // after b2: keys {1,3,4} -> n=3, checksum 1+3+4=8
      IncrementalLoad.AuditedReport("b2", 4, 3, 1, 3, 8),
      // after b3: keys {1,3} -> n=2, checksum 4
      IncrementalLoad.AuditedReport("b3", 2, 1, 1, 2, 4)))
  }

  test("ten-batch fold: correct final state, lineage truncated between folds") {
    val snapshot = (1L to 50L).map(i => (i, s"name$i", 1))
      .toDF("c_id", "c_name", "c_tier")
    // batch k updates customer k and deletes customer 50-k+1
    val batches = (1 to 10).map { k =>
      s"b$k" -> Seq(
        ("U", k * 100L + 1, k.toLong, s"name$k-v$k", k + 1),
        ("D", k * 100L + 2, 50L - k + 1, "", 0))
        .toDF("cdc_flag", "cdc_dsn", "c_id", "c_name", "c_tier")
    }
    val (state, reports) = IncrementalLoad.run(snapshot, batches, Seq("c_id"))

    assert(reports.size === 10 &&
      reports.forall(r => r.n_records == 2 && r.n_upserts == 1 && r.n_deletes == 1))
    val rows = state.orderBy("c_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.length === 40, "10 of 50 customers deleted")
    assert((1 to 10).forall(k => rows(k - 1) == ((k.toLong, s"name$k-v$k", k + 1))),
      s"updated customers must carry their batch's values: ${rows.take(10).toSeq}")
    assert(rows.forall(_._1 <= 40L), "customers 41..50 must be gone")

    // the returned snapshot is checkpoint-backed, not a 10-fold plan: its
    // logical plan is the materialized RDD, so fold N+1 never re-derives
    // folds 1..N (the unbounded-lineage defect flagged in round 2)
    assert(state.queryExecution.logical.toString.contains("LogicalRDD"),
      s"final state should be checkpoint-backed:\n${state.queryExecution.logical}")
  }
}
