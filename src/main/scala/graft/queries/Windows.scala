package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Exprs.moneySum

/** Window-function block + the TPC-DI-signature temporal joins
  * (SURVEY.md §2.5, plus §2.3 `q_join_range_scd2` / `q_join_conditional_key` /
  * `q_self_join_pairing`).
  *
  * Determinism rules: rank/dense_rank windows may order by tie-heavy columns
  * (their outputs are tie-stable), but row_number windows always carry a unique
  * tie-break key; top-k ranks compare ROUNDED measures so cross-engine float
  * noise cannot flip orderings (SURVEY.md §5.3).
  */
object Windows {

  /** §2.5 row_number / rank / dense_rank per partition — latest-record selection
    * when applying CDC updates. */
  def qWinRank(spark: SparkSession, dir: String): DataFrame = {
    val wTies = Window.partitionBy("o_custkey").orderBy(col("o_orderpriority").asc)
    val wUniq = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderpriority").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(wUniq))
      .withColumn("rk", rank().over(wTies))
      .withColumn("drk", dense_rank().over(wTies))
      // relative-position battery over the SAME window spec (no extra sort
      // or exchange): percent_rank = (rk-1)/(n-1), cume_dist = peers≤/n —
      // exact small rationals in IEEE double on both engines, rounded per
      // the §5.3 float discipline anyway
      .withColumn("prk", round(percent_rank().over(wTies), 6))
      .withColumn("cd", round(cume_dist().over(wTies), 6))
      .filter(col("rn") <= 5)
      .select("o_custkey", "o_orderkey", "o_orderpriority", "rn", "rk", "drk",
              "prk", "cd")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** §2.5 SCD2 end-dating: EndDate = lead(EffectiveDate), open-ended last row,
    * IsCurrent = EndDate IS NULL — the DimCustomer/DimCompany history build,
    * rebuilt over per-customer distinct order dates. */
  def qWinScd2EndDate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("eff")
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate").as("eff"))
      .distinct()
      .withColumn("end_raw", lead(col("eff"), 1).over(w))
      // Sentinel kept inside pandas/arrow ns-timestamp range (max 2262) so the
      // driver-side compare can materialize it; 9999-12-31 would overflow.
      .withColumn("end_date",
        coalesce(col("end_raw"), lit("2200-01-01 00:00:00").cast("timestamp_ntz")))
      .withColumn("is_current", col("end_raw").isNull)
      .select("o_custkey", "eff", "end_date", "is_current")
      .orderBy("o_custkey", "eff")
  }

  /** §2.5 Running balance: cumulative sum per account ordered by time — the
    * FactCashBalances `Cash` column, rebuilt as cumulative event value per user. */
  def qWinRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Decimal-cast before the window sum: engines may evaluate running frames
    // with different accumulation structures (segment trees vs streaming), so
    // only an exact sum is cross-engine stable (see Exprs). decimal(24,6)
    // matches the oracle's CAST exactly — same snap scale on both sides.
    Tables.events(spark, dir)
      .withColumn("running_value",
        sum(col("value").cast("decimal(24,6)")).over(w).cast("double"))
      .select("user_id", "event_id", "running_value")
      .orderBy("user_id", "event_id")
  }

  /** §2.5 RANGE frame over time: 30-day rolling high per part — the
    * FactMarketHistory 52-week-high shape. Spark range frames are numeric, so
    * the timestamp is cast to an epoch-day int on BOTH engines (§5.3). */
  def qWinRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date"))
    val w = Window.partitionBy("l_partkey").orderBy("ship_day").rangeBetween(-30, 0)
    Tables.lineitem(spark, dir)
      .withColumn("ship_day", day)
      .withColumn("rolling_high", round(max("l_extendedprice").over(w), 2))
      .withColumn("n_in_window", count(lit(1)).over(w))
      .select("l_orderkey", "l_linenumber", "l_partkey", "ship_day",
              "rolling_high", "n_in_window")
      // (l_orderkey, l_linenumber) is NOT unique in the testdata — order by
      // every output column for a cross-engine total order.
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "ship_day",
               "rolling_high", "n_in_window")
  }

  /** §2.5 Top-N per group: top-3 parts by revenue per supplier (top holdings
    * per account shape). Rank compares the ROUNDED measure + unique key. */
  def qWinTopkGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("revenue").desc, col("l_partkey").asc)
    Tables.lineitem(spark, dir)
      .groupBy("l_suppkey", "l_partkey")
      .agg(Exprs.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
             .as("revenue"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("l_suppkey", "l_partkey", "revenue", "rn")
      .orderBy("l_suppkey", "rn")
  }

  /** §2.5 Navigation + distribution window functions: lag/lead neighbors,
    * running first value, quartile bucket, percent_rank/cume_dist — the
    * per-account statement shape (prior balance, next trade, percentile of
    * spend). Deterministic: the order key is unique per partition, and the
    * ratio outputs are rounded on both engines. */
  def qWinNavigation(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("first_price", first(col("o_totalprice")).over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** §2.3 Point-in-time (SCD2 interval) join — THE signature TPC-DI operator:
    * every fact row resolves the dimension version current at fact time
    * (DimTrade→DimSecurity shape). Intervals are derived from per-customer
    * distinct order dates (eff inclusive, end exclusive, last open-ended).
    *
    * Scale note: the join keeps an EQUI component (custkey) with the interval
    * predicate as residual, so Catalyst plans a sort-merge join, not a nested
    * loop — the property that keeps this viable at 100 TB.
    *
    * The dim frame is PINNED (r16, skew gate): with the window riding
    * directly between the dim shuffle and the join, AQE's OptimizeSkewedJoin
    * cannot address the dim side's shuffle blocks and DECLINES to split a
    * hot fact customer (the rule only matches sort-over-shuffle-stage on
    * BOTH inputs). Materializing the dimension-sized version table first
    * puts the join's dim input behind its own fresh exchange, and the
    * measured hot-key gate (ScaleUp skew section) shows the split firing —
    * the same shape [[graft.etl.WarehouseEtl]]'s pinned SCD2 versions frame
    * uses. Cost: one dimension-sized materialization (|customer·dates|,
    * far below fact scale). */
  def qJoinRangeScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("d_custkey").orderBy("eff")
    val dim = Exprs.pinShared(Tables.orders(spark, dir)
      .select(col("o_custkey").as("d_custkey"), col("o_orderdate").as("eff"))
      .distinct()
      .withColumn("end_ts", lead(col("eff"), 1).over(w)))
    val fact = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"), col("l_shipdate"))
    fact.join(dim,
        col("o_custkey") === col("d_custkey") &&
        col("l_shipdate") >= col("eff") &&
        (col("end_ts").isNull || col("l_shipdate") < col("end_ts")))
      .select(col("l_orderkey"), col("l_linenumber"), col("eff").as("version_eff"))
      .orderBy("l_orderkey", "l_linenumber", "version_eff")
  }

  /** §2.3 Interval-OVERLAP join via bin bucketing — the scalable form of a
    * pure range join with NO equi key: monthly 3-day windows × lineitem
    * [ship, receipt] service intervals. A raw inequality join can only plan
    * a nested loop; binning both interval sets into fixed 32-day buckets
    * turns it into a bucket EQUI-join (hash-partitionable, AQE-skew-
    * splittable) with the true overlap test as residual and a distinct to
    * collapse pairs discovered in two buckets. Candidate count scales with
    * per-bucket interval density, not |A|×|B| — the property that keeps a
    * both-sides-large overlap join alive at 100 TB. */
  def qJoinIntervalBin(spark: SparkSession, dir: String): DataFrame = {
    val epoch = lit("1992-01-01")
    val bin = 32
    def bucketOf(d: Column) = floor(datediff(d, epoch) / bin)
    val wins = Tables.orders(spark, dir)
      .select(trunc(col("o_orderdate"), "month").as("w_start")).distinct()
      .withColumn("w_end", date_add(col("w_start"), 2))
      .withColumn("bucket",
        explode(sequence(bucketOf(col("w_start")), bucketOf(col("w_end")))))
    // service interval: ship date + a deterministic 1..30-day duration
    // (the synthetic lineitem carries no receipt date; keyed arithmetic
    // mirrors verbatim in the oracle)
    val lines = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_shipdate").cast("date").as("svc_start"))
      .withColumn("svc_end", date_add(col("svc_start"),
        (lit(1) + pmod(col("l_orderkey") + col("l_linenumber"), lit(30))).cast("int")))
      .withColumn("bucket",
        explode(sequence(bucketOf(col("svc_start")), bucketOf(col("svc_end")))))
    wins.join(lines, Seq("bucket"))
      .filter(col("svc_start") <= col("w_end") && col("w_start") <= col("svc_end"))
      // distinct line KEYS in service (also collapses the pair a line found
      // in two buckets produces — and the synthetic lineitem carries
      // duplicate (orderkey, linenumber) keys, so the oracle DISTINCTs too)
      .select("w_start", "l_orderkey", "l_linenumber").distinct()
      .groupBy("w_start")
      .agg(count(lit(1)).as("n_lines"), countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy("w_start")
  }

  /** §2.3 Per-row conditional join key — the FINWIRE CoNameOrCIK dispatch
    * (join DimCompany on CIK when the field is numeric, else on name), rebuilt
    * as a supplier lookup by id-string or by name. Implemented as two equi-join
    * branches + union, so both paths stay hash/sort-merge joinable at scale
    * (a single OR-condition join would force a nested loop). */
  def qJoinConditionalKey(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir)
    val li = Tables.lineitem(spark, dir)
      .withColumn("ref",
        when(col("l_linenumber") % 2 === 0, col("l_suppkey").cast("string"))
          .otherwise(concat(lit("Supplier#"),
                            lpad(col("l_suppkey").cast("string"), 9, "0"))))
      .select("l_orderkey", "l_linenumber", "ref")
    val byId = li.filter(col("ref").rlike("^[0-9]+$"))
      .join(sup, col("ref").cast("bigint") === col("s_suppkey"))
    val byName = li.filter(!col("ref").rlike("^[0-9]+$"))
      .join(sup, col("ref") === col("s_name"))
    byId.unionByName(byName)
      .select("l_orderkey", "l_linenumber", "s_suppkey", "s_name")
      .orderBy("l_orderkey", "l_linenumber", "s_suppkey")
  }

  /** §2.3 As-of join — each fact row picks the LATEST reference row of the
    * same key at-or-before its time (quote-to-trade resolution; here: each
    * click resolves the user's most recent purchase). Composed from
    * built-ins, the scalable idiom: union-tag both sides, ONE window per
    * key ordered by (time, side) with `last(_, ignoreNulls)` carrying the
    * reference columns forward — one shuffle + sort, no interval build, no
    * candidate fanout, facts with no prior reference keep nulls. Reference
    * rows sort before same-instant facts so an equal-time match counts.
    * The DuckDB oracle is an independent formulation: native `ASOF LEFT
    * JOIN`. */
  def qJoinAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(1).as("is_fact"), lit(null).cast("long").as("p_id"),
        lit(null).cast("double").as("p_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(0).as("is_fact"), col("event_id").as("p_id"), col("value").as("p_value"))
    val w = Window.partitionBy("user_id").orderBy("ts", "is_fact")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_purchase_id", last(col("p_id"), ignoreNulls = true).over(w))
      .withColumn("last_purchase_value",
        last(col("p_value"), ignoreNulls = true).over(w))
      .filter(col("is_fact") === 1)
      .select(col("user_id"), col("event_id").as("click_id"), col("ts"),
              col("last_purchase_id"), col("last_purchase_value"))
      .orderBy("user_id", "click_id")
  }

  /** §2.3 Event pairing: each signup paired with the user's first later
    * purchase (FactWatches ACTV/CNCL pairing shape).
    *
    * Window form, not a self-join: the r01 join+min-aggregate expanded to
    * signups×purchases pairs per user before aggregating — quadratic on a
    * skewed power-user key at scale. Here both event types are sorted once
    * per user and each signup reads `min(purchase ts)` from a strictly-later
    * RANGE frame over epoch-µs (strict `>` = range start +1µs, exact because
    * events are µs-aligned — Tables.events) — one shuffle + sort, zero fanout. */
  def qSelfJoinPairing(spark: SparkSession, dir: String): DataFrame = {
    // timestamp_ntz has no direct unix_micros; the session TZ is pinned UTC so
    // the ntz→ltz cast is instant-preserving.
    val w = Window.partitionBy("user_id").orderBy("ts_us")
      .rangeBetween(1L, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("p_ts", when(col("event_type") === "purchase", col("ts")))
      .withColumn("first_purchase_ts", min(col("p_ts")).over(w))
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"),
              col("ts").as("signup_ts"), col("first_purchase_ts"))
      .orderBy("user_id", "signup_id")
  }

  /** §2.5 Distribution window functions: ntile / percent_rank / cume_dist —
    * the quartile-bucketing and percentile-position shape (customer-tier
    * assignment). The ordering includes the unique orderkey so bucket
    * boundaries are deterministic; the doubles are floor-snapped (round()
    * breaks decimal ties differently across engines, SURVEY §5.3). */
  def qWinNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        (floor(percent_rank().over(w) * 1e6) / 1e6).as("pct_rank"),
        (floor(cume_dist().over(w) * 1e6) / 1e6).as("cume"))
      .orderBy("o_orderkey")
  }

  /** §2.5 Trailing moving average over a ROWS frame (7-row window of order
    * spend per customer) — the smoothing shape [SPEC: FactMarketHistory].
    * Two determinism rules: the window order ends in the unique o_orderkey
    * (a ROWS frame over a non-total order has nondeterministic contents —
    * lineitem's (orderkey, linenumber) is NOT unique and even a single
    * engine returns different frames run-to-run); and the frame sum goes
    * through exact DECIMAL, not double — Spark re-scans the frame buffer
    * sequentially while DuckDB aggregates sliding frames with a segment
    * tree, so double sums can differ in the last ulp between engines. */
  def qWinMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(-6, 0)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        (floor(sum(col("o_totalprice").cast("decimal(24,6)")).over(w)
                 .cast("double")
               / count(lit(1)).over(w) * 1e6) / 1e6).as("ma7"))
      .orderBy("o_orderkey")
  }

  /** §2.5 Time-series gap fill: a generated date spine left-joined against
    * daily counts, missing days zero-filled — the calendar-densification
    * shape reporting pipelines need. The spine is `sequence(min, max)` off a
    * 1-row aggregate, so it is tiny regardless of fact size and broadcasts
    * into the join; the only shuffle is the daily pre-aggregation. */
  /** §2.5 Time-series gap INTERPOLATION — [[qGapFill]]'s zero-fill upgraded
    * to linear interpolation: per order-priority daily revenue, missing days
    * take the value linearly interpolated between their nearest present
    * neighbors (edge gaps take the nearest known value) — the resampling
    * step before any regular-interval time-series model.
    *
    * Shape: the per-group spine is a bounded cross of |groups| × the 1-row
    * exploded day range; neighbor lookup is `last/first(..., ignoreNulls)`
    * over two keyed window frames — one shuffle on the group key, linear
    * scan per partition, no self-join against the known-day set. The
    * interpolation ratio is computed as (day-int deltas) divide-first in
    * both engines, and the filled value floor-snaps to 1e-4. */
  def qInterpolate(spark: SparkSession, dir: String): DataFrame = {
    // base feeds the day-bounds aggregate, the spine's distinct priorities,
    // AND the fill join — pinned (prio×days rows of three columns) so the
    // orders scan + aggregation runs once, not three times (Exprs.pinShared
    // rationale, PLANS.md r9)
    val base = Exprs.pinShared(Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("prio"),
               col("o_orderdate").cast("date").as("day"))
      .agg(moneySum(col("o_totalprice")).as("v")))
    val days = base.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val spine = base.select("prio").distinct().crossJoin(broadcast(days))
    val wP = Window.partitionBy("prio").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("prio").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val kd = when(col("v").isNotNull, col("day"))
    // base is GRID-BOUNDED (≤ |priorities| × |days| rows at ANY corpus
    // scale — the group-by collapses the fact table onto the calendar), so
    // the fill join broadcasts it EXPLICITLY: statistics-driven planning
    // flips this to a 3-exchange sort-merge join once the estimate crosses
    // the threshold (measured at 10× sf0.1) even though the frame itself
    // never grows with the data.
    val j = spine.join(broadcast(base), Seq("prio", "day"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wP))
      .withColumn("pd", last(kd, ignoreNulls = true).over(wP))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wF))
      .withColumn("nd", first(kd, ignoreNulls = true).over(wF))
    j.select(col("prio"), col("day"),
        (floor((when(col("v").isNotNull, col("v"))
          .when(col("pd").isNotNull && col("nd").isNotNull,
            col("pv") + (col("nv") - col("pv")) *
              (datediff(col("day"), col("pd")).cast("double")
               / datediff(col("nd"), col("pd")).cast("double")))
          .otherwise(coalesce(col("pv"), col("nv")))) * 1e4) / 1e4).as("filled"),
        col("v").isNull.as("was_gap"))
      .orderBy("prio", "day")
  }

  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    // daily feeds the spine bounds AND the fill join — pinned (days rows)
    // so the orders scan + aggregation runs once (Exprs.pinShared, r9)
    val daily = Exprs.pinShared(Tables.orders(spark, dir)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(count(lit(1)).as("n_orders")))
    val spine = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("day")
  }
}
