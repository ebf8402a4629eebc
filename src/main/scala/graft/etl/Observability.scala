package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-flight pipeline observability (SURVEY.md §2.10 ops surface): named
  * data-quality metrics attached with `Dataset.observe` — the counters ride
  * the SAME tasks that execute the query, so a 100 TB run gets row counts /
  * null counts / value bounds for free, where the audit-query alternative
  * (`q_batch_validation`, `q_profile_columns`) is a second full scan. The
  * two designs are complementary: observe() monitors every production run
  * in-flight; the audit queries are the standalone deep-profiling pass.
  *
  * Delivery is engine-native: batch metrics surface through a
  * `QueryExecutionListener` after the action completes; streaming metrics
  * arrive on EVERY `StreamingQueryProgress` (per micro-batch — the shape a
  * continuous-ingest dashboard consumes). Both are driver-side metadata
  * rows, never a data-sized collect.
  *
  * CAVEAT (measured, not hypothetical): do NOT attach an observation
  * upstream of a `foreachBatch` sink whose body runs MULTIPLE actions over
  * the received frame — each action re-executes the source plan and the
  * observed counters ACCUMULATE across executions inside the one
  * micro-batch (a 2-row batch whose body triggers three actions reports
  * n_rows = 6). Observations belong on single-action sinks (memory /
  * file / console, or a foreachBatch that pins the frame with ONE eager
  * action and derives everything from the pin).
  */
object Observability {

  /** Attach the standard quality observation to a frame: total rows, nulls
    * in `watch`, and min/max over `watch` (long-snapped so the metric row is
    * exact and engine-portable). The returned frame computes EXACTLY what it
    * did before — observe is a pass-through node; the aggregates fold into
    * the existing tasks. */
  def observed(df: DataFrame, name: String, watch: Column): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(watch.isNull.cast("long")).as("n_null"),
      min(watch.cast("long")).as("lo"),
      max(watch.cast("long")).as("hi"))

  /** Collect a BATCH frame while capturing its observation: returns the
    * rows plus the observed metrics as a plain map. Wires the
    * one-action listener dance (register, act, await, unregister) so
    * callers don't repeat it. The `collect` is the CALLER's action on the
    * CALLER's frame (size it accordingly — this is the convenience form
    * for result-sized frames); a production 100 TB run attaches
    * [[observed]] to its WRITE action instead and reads the same metrics
    * from the listener, collecting nothing. */
  def collectObserved(df: DataFrame, name: String)
      : (Array[org.apache.spark.sql.Row], Map[String, Long]) = {
    val spark = df.sparkSession
    val seen = new java.util.concurrent.atomic.AtomicReference[Map[String, Long]]
    val latch = new java.util.concurrent.CountDownLatch(1)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        // IDENTITY guard, not just the name (ADVICE r13): the listener is
        // session-global, so a concurrent action on this SparkSession whose
        // plan carries an identically-named observation would otherwise
        // satisfy the latch and attribute the OTHER execution's metrics to
        // this collect. Our collect() below acts on df's own
        // QueryExecution instance — accept exactly that one.
        if (qe eq df.queryExecution) qe.observedMetrics.get(name).foreach { row =>
          seen.set(row.schema.fieldNames.zipWithIndex.collect {
            case (f, i) if !row.isNullAt(i) => f -> row.getLong(i)
          }.toMap)
          latch.countDown()
        }
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val rows = df.collect()
      // listener delivery is async on the listener bus
      require(latch.await(30, java.util.concurrent.TimeUnit.SECONDS),
        s"observation '$name' was not delivered within 30s")
      (rows, seen.get())
    } finally spark.listenerManager.unregister(listener)
  }
}
