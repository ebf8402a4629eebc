package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared oracle-parity-safe aggregate expressions (SURVEY.md §5.3).
  *
  * Summing doubles is order-dependent, and Spark's partial-aggregation order
  * varies with partitioning while DuckDB's varies with its own vectorization —
  * so a `round(sum(double), 2)` can flip at a rounding boundary between
  * engines. Casting each element to DECIMAL(24,6) first makes the sum exact
  * and order-independent: the per-row value is computed in double (identical
  * IEEE ops on identical inputs in both engines), snapped to 6 decimal digits,
  * then summed exactly. The final cast back to double is deterministic.
  */
object Exprs {
  /** Order-independent money sum, exact to 6 decimal places. Scale 6 matters:
    * money expressions multiply up to three 2-decimal factors, so the true
    * value has up to 6 decimal digits — casting at a smaller scale would put
    * true values exactly on rounding ties, which the two engines break from
    * different double representations. At scale >= the true decimal width both
    * engines recover the exact value. */
  def moneySum(c: Column): Column =
    sum(c.cast("decimal(24,6)")).cast("double")

  /** Order-independent mean: exact decimal sum, double division, round(4). */
  def moneyAvg(c: Column): Column =
    round(sum(c.cast("decimal(24,6)")).cast("double") / count(lit(1)), 4)

  /** Materialize a NARROW frame consumed by multiple branches of one query
    * DAG (PLANS.md r9 adjudication: Spark's exchange reuse does not fire
    * across column-pruned consumer copies, so a shared subtree recomputes —
    * full source scans included — once per consumer). Pin only frames that
    * are aggregate-narrow relative to their source; policy mirrors the CC
    * operators: reliable checkpoint when the session has a checkpoint dir,
    * executor-local otherwise.
    *
    * Sessions that DO configure a checkpoint dir should also set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (the harness
    * builders do): reliable checkpoint files are never deleted by default,
    * and with ~15 queries pinning per sweep a long-lived session
    * accumulates them without bound. */
  def pinShared(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint(true)

  /** [[pinShared]] for a STATIONARY keyed table (r19, guide §2.4/§3.4): the
    * frame is first hash-repartitioned on `key` with an explicit partition
    * count (REPARTITION_BY_NUM — AQE never coalesces or re-places it), then
    * pinned, then re-declared with the partitioning the materialized RDD
    * actually has ([[org.apache.spark.sql.GraftSqlBridge.withHashPartitioning]]
    * — the checkpoint's LogicalRDD otherwise reports UnknownPartitioning and
    * every keyed consumer re-shuffles it). Use for tables an iterative loop
    * joins/aggregates on the SAME key every round (CC edges, pagerank
    * edges): construction pays the one shuffle, the rounds shuffle only the
    * small side. */
  def pinHashPartitioned(df: org.apache.spark.sql.DataFrame, key: String)
      : org.apache.spark.sql.DataFrame = {
    val n = stationaryPartitions(df)
    pinPrePartitioned(df.repartition(n, col(key)), key, n)
  }

  /** SIZE-DERIVED partition count for a stationary pinned table (guide
    * §2.1/§2.2: partitions sized in the 100 MB–1 GB band, derived from the
    * input rather than a constant tuned for either local mode or the
    * cluster). An explicit-count repartition is exempt from AQE coalescing
    * by design (that is what makes the declared partitioning truthful), so
    * the count must be right by construction: Catalyst's free sizeInBytes
    * estimate over the frame's plan, one partition per 128 MB, clamped to
    * [1, spark.sql.shuffle.partitions]. At bench SFs this lands on 1 (the
    * pinned edge frames are KB–MB), so loop stages stay single-wave; at
    * warehouse scale the estimate saturates the clamp and the stationary
    * table is as wide as the session's configured shuffle width. */
  def stationaryPartitions(df: org.apache.spark.sql.DataFrame): Int = {
    val maxN = BigInt(df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    (est / (128L << 20)).min(maxN).max(BigInt(1)).toInt
  }

  /** Declare-and-pin for a frame ALREADY exactly hash-partitioned on `key`
    * into `n` partitions (a `repartition(n, key)` followed only by
    * partitioning-preserving ops — same-key windows, filters, projections
    * keeping the key). The contract is the caller's to uphold; see
    * [[org.apache.spark.sql.GraftSqlBridge.withHashPartitioning]]. */
  def pinPrePartitioned(df: org.apache.spark.sql.DataFrame, key: String, n: Int)
      : org.apache.spark.sql.DataFrame = {
    val pinned =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint(true)
    org.apache.spark.sql.GraftSqlBridge.withHashPartitioning(pinned, key, n)
  }
}
