package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TPC-DI incremental-update driver (SURVEY.md §2.10, [SPEC: incremental
  * updates]): Batches 2..N arrive as CDC record streams (`CDC_FLAG` ∈ I/U/D
  * plus a `CDC_DSN` sequence number) and fold into the current warehouse
  * snapshot one batch at a time — latest record per key wins, deletes
  * remove. Emits a DImessages-style per-batch report alongside the final
  * state, mirroring the spec's batch-validation bookkeeping.
  *
  * Scale note: each fold is one keyed window + one keyed anti-join
  * (Scd2.applyCdc); at production batch counts the snapshot should be
  * checkpointed/persisted between folds to truncate lineage — the fold
  * structure itself is exactly what a foreachBatch streaming upsert runs
  * per micro-batch (Streams.upsertToParquet).
  */
object IncrementalLoad {

  /** One batch's DImessages-style bookkeeping row. */
  final case class BatchReport(batch: String, n_records: Long,
                               n_upserts: Long, n_deletes: Long)

  /** Fold CDC batches (in order) into the snapshot; returns the final state
    * and one report per batch. */
  def run(snapshot: DataFrame, batches: Seq[(String, DataFrame)],
          keyCols: Seq[String], seqCol: String = "cdc_dsn",
          flagCol: String = "cdc_flag"): (DataFrame, Seq[BatchReport]) =
    batches.foldLeft((snapshot, Vector.empty[BatchReport])) {
      case ((snap, reports), (name, cdc)) =>
        val n = cdc.count()
        val nDel = cdc.filter(col(flagCol) === "D").count()
        val next = Scd2.applyCdc(snap, cdc, keyCols, seqCol, flagCol)
        (next, reports :+ BatchReport(name, n, n - nDel, nDel))
    }
}
