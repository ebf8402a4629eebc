package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Observability

/** The observe()-based in-flight metrics surface ([[graft.etl.Observability]]):
  * batch metrics must equal an independent aggregation of the same frame
  * (the zero-extra-scan claim is only worth anything if the numbers are the
  * REAL ones), and a streaming observation must arrive on every
  * micro-batch's progress with per-batch values. */
class ObservabilitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("batch observation matches an independent aggregation; rows unchanged") {
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val (rows, metrics) =
      Observability.collectObserved(
        Observability.observed(ev, "ev_quality", col("user_id")), "ev_quality")
    val expect = ev.agg(
      count(lit(1)), sum(col("user_id").isNull.cast("long")),
      min(col("user_id").cast("long")), max(col("user_id").cast("long"))).head()
    assert(rows.length.toLong === expect.getLong(0),
      "observe must be a pass-through: same rows out")
    assert(metrics === Map(
      "n_rows" -> expect.getLong(0), "n_null" -> expect.getLong(1),
      "lo" -> expect.getLong(2), "hi" -> expect.getLong(3)),
      s"observed metrics must equal the independent aggregation, got $metrics")
  }

  test("streaming observation arrives per micro-batch with that batch's counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Observability.observed(mem.toDF(), "ingest_quality", col("user_id"))
      .writeStream.format("memory").queryName("t_observe").outputMode("append")
      .start()
    try {
      mem.addData(Ev(1, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "click", 1.0),
                  Ev(2, Timestamp.valueOf("2024-01-01 10:01:00"), 9L, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(3, Timestamp.valueOf("2024-01-01 10:02:00"), 4L, "click", 1.0))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val perBatch = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.asScala.getOrElse("ingest_quality", null)))
        .map(r => (r.getAs[Long]("n_rows"), r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      assert(perBatch === Seq((2L, 7L, 9L), (1L, 4L, 4L)),
        s"each micro-batch must carry its own observation, got $perBatch")
    } finally q.stop()
  }
}
