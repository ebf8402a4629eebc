package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Exprs.moneySum

/** CDC / event-time block (SURVEY.md §2.10) — TPC-DI's incremental Batches 2–3
  * ARE micro-batch CDC application; these are the batch forms of the semantics
  * (the Structured Streaming wrappers in [[graft.stream.Streams]] share the
  * same shapes and are covered by MemoryStream scalatests, since the DuckDB
  * oracle can only check batch output).
  *
  * Scale posture: latest-per-key is a single hash shuffle on the key + one
  * sort per partition (no self-join); sessionization is gaps-and-islands —
  * one shuffle + sort per user, linear in events; tumbling windows are a
  * plain hash aggregation with map-side partials.
  */
object Cdc {

  /** §2.10 CDC apply: latest record per key wins, delete-flag removes — the
    * incremental Customer.txt/Account.txt I/U/D application. Rebuilt over
    * `events`: per-user latest event is the current state; users whose latest
    * event is `error` (the delete flag) drop out. */
  def qCdcApply(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_id").as("last_event_id"),
              col("event_type").as("last_type"), col("ts").as("last_ts"))
      .orderBy("user_id")
  }

  /** §2.10 Historized (Type-2) CDC apply — the true TPC-DI incremental
    * dimension semantics, as a declared oracled query: events before the
    * split date build the versioned history ([[graft.etl.Scd2.fromChangeLog]]),
    * events after it form the CDC batch (latest per user wins, `error` =
    * delete flag), and [[graft.etl.Scd2.applyCdcHistorized]] end-dates each
    * affected open version at the change's effective time, appends the new
    * current version, and closes deleted keys without a successor. */
  def qCdcScd2(spark: SparkSession, dir: String): DataFrame = {
    val split = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").as("eff"), col("event_type"), col("event_id"))
    val hist = graft.etl.Scd2.fromChangeLog(
      ev.filter(col("eff") < split).drop("event_id"), Seq("user_id"), "eff")
    val cdc = ev.filter(col("eff") >= split)
      .withColumn("flag",
        when(col("event_type") === "error", "D").otherwise("U"))
    val next = graft.etl.Scd2.applyCdcHistorized(
      hist, cdc, Seq("user_id"), "event_id", "flag")
    next.select(col("user_id"), col("eff"), col("end").as("end_ts"),
                col("is_current"), col("event_type"))
      .orderBy("user_id", "eff")
  }

  /** §2.10 Snapshot diff / reconciliation: classify every key as Inserted /
    * Updated / Deleted between the table's state at a cut timestamp and its
    * state now — the audit step after any incremental load (does replaying
    * the CDC batches land exactly on the rebuilt snapshot?), and the
    * change-feed generator when a source system only hands you full dumps.
    *
    * Shape at scale: each snapshot is one keyed window (latest-per-key);
    * the comparison is a FULL OUTER equi-join on the key — sort-merge-able,
    * no residuals — and unchanged keys drop before the output. */
  def qSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val split = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    def stateAt(cut: Option[Column]): DataFrame = {
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      val base = Tables.events(spark, dir)
      cut.map(c => base.filter(col("ts") < c)).getOrElse(base)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select("user_id", "event_id")
    }
    val old = stateAt(Some(split))
      .select(col("user_id").as("u1"), col("event_id").as("old_event_id"))
    val now = stateAt(None)
      .select(col("user_id").as("u2"), col("event_id").as("new_event_id"))
    old.join(now, col("u1") === col("u2"), "full")
      .filter(col("u1").isNull || col("u2").isNull ||
        col("old_event_id") =!= col("new_event_id"))
      .select(coalesce(col("u1"), col("u2")).as("user_id"),
        when(col("u1").isNull, "I").when(col("u2").isNull, "D").otherwise("U").as("op"),
        col("old_event_id"), col("new_event_id"))
      .orderBy("user_id")
  }

  /** §2.10 The CDC incremental DRIVER as a declared query (r10) — TPC-DI's
    * Batches 2..N shape, end to end: a snapshot is built from the events
    * before a cut, three time-ranged CDC batches (I/U/D envelope: latest
    * per key wins, `error` = delete) fold into it one at a time through
    * [[graft.etl.IncrementalLoad.runAudited]], and the OUTPUT is the
    * per-batch DImessages bookkeeping — record/upsert/delete counts plus
    * post-fold state size and an event_id checksum, so the oracle verifies
    * not just each batch's envelope arithmetic but the warehouse STATE
    * after every fold.
    *
    * The CDC sequence is `event_id` (globally unique in the testdata, and
    * the snapshot's latest-per-key uses the same ordering), which gives the
    * fold a closed form the oracle restates: after batch k, a user's state
    * is the event with the largest (batch_index, event_id) among events
    * before the batch's upper bound — absent if that event is a delete.
    *
    * Scale shape: each fold is one keyed window over the batch + one keyed
    * anti-join + union ([[graft.etl.Scd2.applyCdc]]); the audit is one
    * aggregation over the checkpointed state (lineage stays bounded at any
    * batch count); the report itself is |batches| driver rows. */
  def qCdcBatches(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bounds = Seq(
      ("b1", "2024-01-10 00:00:00", "2024-01-20 00:00:00"),
      ("b2", "2024-01-20 00:00:00", "2024-01-25 00:00:00"),
      ("b3", "2024-01-25 00:00:00", "9999-01-01 00:00:00"))
    def ts(s: String) = lit(s).cast("timestamp_ntz")
    val ev = Tables.events(spark, dir)
    def asState(df: DataFrame): DataFrame =
      df.select(col("user_id"), col("event_id").as("last_event_id"),
                col("event_type").as("last_type"), col("ts").as("last_ts"))
    val wSnap = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    val snapshot = asState(ev.filter(col("ts") < ts(bounds.head._2))
      .withColumn("rn", row_number().over(wSnap))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .drop("rn"))
    val batches = bounds.map { case (name, lo, hi) =>
      name -> asState(ev.filter(col("ts") >= ts(lo) && col("ts") < ts(hi)))
        .withColumn("cdc_dsn", col("last_event_id"))
        .withColumn("cdc_flag",
          when(col("last_type") === "error", "D").otherwise("U"))
    }
    val (_, reports) = graft.etl.IncrementalLoad.runAudited(
      snapshot, batches, Seq("user_id"), checksumCol = "last_event_id")
    reports.zipWithIndex
      .map { case (r, i) => (i + 1, r.batch, r.n_records, r.n_upserts,
        r.n_deletes, r.n_keys_after, r.state_checksum) }
      .toDF("batch_idx", "batch", "n_records", "n_upserts", "n_deletes",
            "n_keys_after", "state_checksum")
      .orderBy("batch_idx")
  }

  /** §2.10 Tumbling event-time windows: per-hour per-type counts and sums —
    * identical query body works on readStream (Structured Streaming's
    * incrementalization model; stream variant in [[graft.stream.Streams]]). */
  def qStreamTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           moneySum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
              col("n_events"), col("sum_value"))
      .orderBy("hour_start", "event_type")

  /** §2.10 SLIDING event-time windows (2-hour windows every hour): each
    * event lands in window_len/slide = 2 overlapping windows — the
    * trailing-window monitoring shape (rates "over the last 2 h" refreshed
    * hourly). Spark's `window(ts, len, slide)` expands the per-row window
    * list before the hash aggregation, so the cost is slide-factor × the
    * tumbling aggregate, still map-side-partial and identical on
    * readStream; the oracle mirrors the expansion with an explicit
    * 2-element unnest. */
  def qSlidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           moneySum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
              col("n_events"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** §2.10 Sequential event funnel: per user, the earliest signup, the
    * earliest view strictly after it, and the earliest purchase strictly
    * after that — ordered-sequence analytics (conversion funnels, ordered
    * audit trails), which plain per-type aggregation cannot express because
    * each stage's window OPENS at the previous stage's time.
    *
    * Shape at scale: one filtered keyed aggregation per stage + keyed
    * equi-joins carrying the opening timestamp as a residual — no windows
    * over raw rows, no self-join fanout (each stage joins one row per
    * user), left joins preserve users who fall out mid-funnel. */
  def qEventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def stage(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), col("ts"))
    val s1 = stage("signup").groupBy("user_id").agg(min(col("ts")).as("t_signup"))
    val s2 = stage("view").join(s1, "user_id")
      .filter(col("ts") > col("t_signup"))
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val s3 = stage("purchase").join(s2, "user_id")
      .filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    s1.join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t_signup"), col("t_view"), col("t_purchase"),
        when(col("t_purchase").isNotNull, 3)
          .when(col("t_view").isNotNull, 2).otherwise(1).as("stage_reached"))
      .orderBy("user_id")
  }

  /** §2.10 Cohort retention matrix: users grouped by the week of their first
    * signup, activity counted per week-offset since that signup — the
    * companion analysis to [[qEventFunnel]] (how many of each cohort are
    * still active N weeks in). Week indices are PURE integer day arithmetic
    * against a fixed epoch (`floor(datediff/7)`), sidestepping the calendar
    * week-start conventions that differ across engines/locales (§5.3).
    *
    * Shape: first-signup per user is one keyed aggregation; the activity
    * frame joins it back by user (equi), derives both week indices
    * map-side, and the matrix is one hash aggregation with a distinct-user
    * count per cell. */
  def qRetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val epoch = lit("2024-01-01").cast("date")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("day"),
              col("event_type"))
    val first = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("day")).as("first_day"))
    ev.join(first, "user_id")
      .filter(col("day") >= col("first_day"))
      .select(col("user_id"),
        floor(datediff(col("first_day"), epoch) / 7).cast("int").as("cohort_wk"),
        floor(datediff(col("day"), col("first_day")) / 7).cast("int").as("week_offset"))
      .groupBy("cohort_wk", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_wk", "week_offset")
  }

  /** §2.10 Event-transition matrix (order-1 Markov estimate): for every
    * (current → next) event-type pair within a user's stream, the count and
    * the row-normalized transition probability — the session-modeling /
    * anomaly-baseline companion to sessionization (a spike in an off-matrix
    * transition is the alert). One keyed window (`lead` per user by time)
    * produces the pairs; counts and row totals are hash aggregations, and
    * the probability is a ratio of exact longs, micro-floor snapped (§5.3).
    * Ties in `ts` are broken by event_id so the sequence is total on both
    * engines. */
  def qMarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("cur"), col("next_type").as("nxt"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("cur").agg(sum(col("n")).as("row_total"))
    pairs.join(totals, "cur")
      .withColumn("p", floor(col("n").cast("double") / col("row_total") * 1e6) / 1e6)
      .select("cur", "nxt", "n", "p")
      .orderBy("cur", "nxt")
  }

  /** §2.10 Daily-count anomaly flags (r8): days whose per-type event count
    * deviates from that type's mean by more than 2σ — the monitoring query
    * every event pipeline runs against its volume baseline (a traffic drop
    * or bot spike surfaces here before it corrupts downstream aggregates).
    *
    * Cross-engine parity: |c − μ| > 2σ is evaluated ENTIRELY in integer
    * arithmetic — with per-type day count n, sum S, and sum-of-squares Q,
    * the test multiplies through by n²:  (n·c − S)² > 4·(n·Q − S²).  No
    * division, no sqrt, no doubles. The squared terms are computed in
    * DECIMAL(38,0): in BIGINT, S² alone overflows int64 once a type's
    * total event count passes ~3·10⁹ (easily reached at 100 TB), and Spark
    * would silently wrap under default non-ANSI mode while DuckDB promotes
    * to HUGEINT — the flags would diverge exactly at scale. Decimal(38,0)
    * is exact to 10³⁸, i.e. per-type totals up to ~10¹⁹ (beyond long
    * itself), and DuckDB's HUGEINT compares identically in that range. */
  def qEventAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("n_days"),
      sum(col("n_events")).as("s"),
      sum(col("n_events") * col("n_events")).as("q"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val dev = dec(col("n_days")) * dec(col("n_events")) - dec(col("s"))
    daily.join(broadcast(stats), "event_type")
      .filter(dev * dev >
        dec(lit(4L)) * (dec(col("n_days")) * dec(col("q")) - dec(col("s")) * dec(col("s"))))
      .select(col("event_type"), col("day"), col("n_events"),
        when(dec(col("n_days")) * dec(col("n_events")) > dec(col("s")), lit("high"))
          .otherwise(lit("low")).as("direction"))
      .orderBy("event_type", "day")
  }

  /** §2.10 Robust (median/MAD) anomaly flags per event type — the
    * breakdown-resistant complement of [[qEventAnomaly]]'s 2σ test: a
    * contaminated baseline inflates μ/σ and masks the very outliers being
    * hunted, while the median and the median-absolute-deviation tolerate up
    * to 50% contamination. The cut is |x − med| > 3·MAD — via the 1.4826
    * normal-consistency constant that is ≈ 2.02σ, the robust twin of
    * [[qEventAnomaly]]'s 2σ rule.
    *
    * Exactness (§5.3, same ANSI-exact posture as [[qEventAnomaly]]):
    * medians of integer daily counts are half-integers, so med×2 and MAD×4
    * are EXACT integers in both engines (`percentile`/`quantile_cont`
    * interpolate identically at 0.5), and the final cut cross-multiplies to
    * `2·dev2 > 3·mad4` — pure BIGINT, no double comparison anywhere.
    *
    * Shape at scale: the event scan collapses to one (type, day) hash agg —
    * PINNED, since both the MAD derivation and the final flag consume it
    * (exchange reuse does not fire across pruned consumers, PLANS.md r9) —
    * then two |types|-row percentile aggs broadcast back; the flag itself is
    * map-side. MAD degeneracy (mad4 = 0 when most days tie at the median)
    * flags every deviating day, the standard behavior, deterministically. */
  def qAnomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val daily = Exprs.pinShared(
      Tables.events(spark, dir)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_events")))
    val med = daily.groupBy("event_type")
      .agg((expr("percentile(n_events, 0.5)") * 2).cast("long").as("med2"))
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("dev2", abs(col("n_events") * 2 - col("med2")))
    val mad = dev.groupBy("event_type")
      .agg((expr("percentile(dev2, 0.5)") * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("dev2") * lit(2L) > lit(3L) * col("mad4"))
      .select(col("event_type"), col("day"), col("n_events"),
        when(col("n_events") * 2 > col("med2"), lit("high"))
          .otherwise(lit("low")).as("direction"))
      .orderBy("event_type", "day")
  }

  /** §2.10 Session windows, 30-min inactivity gap per user, batch parity via
    * gaps-and-islands: flag rows starting a new session (gap > 30 min from
    * the previous event), running-sum the flags into a session id, aggregate.
    * Gap arithmetic in epoch-µs on both engines (events are µs-aligned). */
  def qSessionWindow(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 30L * 60 * 1000000 // 30 minutes
    Tables.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(running))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"), moneySum(col("value")).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** §2.10 Micro-duplicate collapse over the event stream — the batch twin of
    * [[graft.stream.Streams.dedupedWithinWatermark]]'s replay protection, at
    * the coarser semantic grain ingest pipelines actually dedup at: repeated
    * (user, type) events inside one clock hour collapse to a single canonical
    * row. The canonical representative is the LOWEST event_id in the bucket —
    * a total, engine-independent choice (keep-"first-arrival" is inherently
    * nondeterministic across replays; keep-min-id is reproducible anywhere).
    *
    * ONE hash aggregation with map-side partials carries the whole operator:
    * `min_by(payload, event_id)` resurrects the kept row's payload inside the
    * agg (event_id is unique, so min_by has no ties), avoiding the join-back
    * a row_number() formulation would need — no window, no second shuffle,
    * and the shuffle carries one row per (user, type, hour) bucket rather
    * than every raw event. At 100 TB that is the difference between
    * shuffling the event firehose and shuffling its hourly support. */
  def qEventDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"),
        // date_trunc yields session-tz TimestampType; the engine keeps every
        // timestamp naive (SURVEY §5.3) — cast back to NTZ like the source ts
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hr"))
      .agg(
        min(col("event_id")).as("event_id"),
        min_by(col("ts"), col("event_id")).as("ts"),
        min_by(col("value"), col("event_id")).as("value"),
        count(lit(1)).as("n_collapsed"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("hr"),
              col("ts"), col("value"), col("n_collapsed"))
      .orderBy("event_id")
}
