package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Exprs.{moneyAvg, moneySum}

/** Relational operator block (SURVEY.md §2.1–2.4, §2.6, §2.7).
  *
  * Every query is a pure `(SparkSession, sfDir) => DataFrame`, ends in a
  * deterministic `orderBy` over a unique key set, and rounds every floating
  * aggregate (oracle-parity rules, SURVEY.md §5.3).
  *
  * Scale posture: all joins/aggs here are expressed declaratively so Catalyst
  * picks broadcast vs sort-merge (AQE re-plans from runtime sizes); dimension
  * joins are explicitly `broadcast()`-hinted where the dimension is bounded by
  * the data model (region/nation/customer), which at 100 TB keeps the fact
  * table shuffle-free for those lookups.
  */
object Relational {

  /** §2.1 Columnar scan + projection pruning: ReadSchema must contain only the
    * three selected columns (verified in RelationalSpec via the physical plan). */
  def qScanParquet(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")

  /** §2.2 Compound predicates (AND/OR, IN, BETWEEN on timestamps, LIKE) —
    * all push down to the parquet scan as data filters. */
  def qFilterPred(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(
        col("o_orderstatus").isin("F", "O") &&
        col("o_orderdate").between(lit("1995-06-01").cast("timestamp_ntz"),
                                   lit("1999-06-30").cast("timestamp_ntz")) &&
        (col("o_totalprice") > 50000.0 || col("o_orderpriority").like("1-%")))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")

  /** §2.2 Derived column via nested CASE WHEN — the DimCustomer "marketing
    * nameplate" rule chain (threshold tags concatenated) rebuilt over customer. */
  def qProjDerived(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .withColumn("nameplate", concat_ws("+",
        when(col("c_acctbal") > 7500.0, lit("HighValue")),
        when(col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"), lit("Industrial")),
        when(col("c_acctbal") < 0.0, lit("Credit"))))
      .withColumn("nameplate",
        when(col("nameplate") === "", lit(null).cast("string")).otherwise(col("nameplate")))
      .select("c_custkey", "c_name", "nameplate")
      .orderBy("c_custkey")

  /** §2.2 Null semantics: NULLIF sentinel, COALESCE default, IS NULL flag. */
  def qCaseNull(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .withColumn("seg_nulled", nullif(col("c_mktsegment"), lit("AUTOMOBILE")))
      .withColumn("seg_filled", coalesce(col("seg_nulled"), lit("UNKNOWN")))
      .withColumn("is_auto", col("seg_nulled").isNull)
      .select("c_custkey", "seg_nulled", "seg_filled", "is_auto")
      .orderBy("c_custkey")

  /** §2.3 Small-dimension lookup chain customer⋈nation⋈region, broadcast-hinted:
    * nation/region are bounded small at any scale — no shuffle of the big side. */
  def qJoinBroadcast(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "n_name", "r_name")
      .orderBy("c_custkey")

  /** §2.3 Large equi-join lineitem⋈orders⋈customer with an aggregate on top —
    * the FactCashBalances shape. Shuffles on the join keys; AQE picks
    * broadcast for the customer side when it fits. */
  def qJoinShuffle(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
             .as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy("c_custkey")

  /** §2.3 Left outer join keeping unmatched dimension rows (Prospect↔DimCustomer
    * IsCustomer shape): customers with no orders surface with NULL order columns. */
  def qJoinLeft(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)

  /** §2.3 Semi join (EXISTS): customers having at least one order. */
  def qJoinSemi(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** §2.3 Anti join (NOT EXISTS): customers with no orders — the INACT/closed
    * entity detection shape. */
  def qJoinAnti(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 250000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** §2.4 Multi-measure hash aggregation — the TPC-H-Q1-shaped pricing summary
    * (daily cash totals / OHLC shape). Partial aggregation is map-side, so the
    * shuffle carries only |groups| rows per partition at any scale. */
  def qAggHash(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
                   * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        moneyAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** §2.4 Distinct aggregation per group (audit-phase counts). */
  def qAggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  /** §2.4 Approximate distinct count (HLL++) — the designed 100 TB answer to
    * distinct counting: constant-size sketch per group, map-side partials,
    * no expand. No oracle (estimators differ across engines); ±5% tolerance
    * vs the exact count is asserted in RelationalSpec and visible here
    * side-by-side. */
  def qAggApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_suppkey")).as("approx_supps"))
      .orderBy("l_returnflag")

  /** §2.4 Post-aggregation filter (HAVING) — batch-validation thresholds. */
  def qAggHaving(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(moneySum(col("o_totalprice")).as("total_spent"),
           count(lit(1)).as("n_orders"))
      .filter(col("total_spent") > 300000.0)
      .orderBy("o_custkey")

  /** §2.4 Hierarchical subtotals region→nation via ROLLUP (audit roll-ups);
    * grouping_id disambiguates subtotal rows from real NULL keys. */
  def qAggRollup(spark: SparkSession, dir: String): DataFrame = {
    val joined = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "c_acctbal")
    // Alias the grouping columns: rollup re-creates them with fresh exprIds,
    // and ordering by the original names trips Spark's ambiguous-self-join
    // detection. Unique aliases keep resolution unambiguous.
    joined.rollup(col("r_name").as("r_name_g"), col("n_name").as("n_name_g"))
      .agg(count(lit(1)).as("n_customers"),
           moneySum(col("c_acctbal")).as("sum_bal"),
           grouping_id().as("gid"))
      .select(col("r_name_g").as("r_name"), col("n_name_g").as("n_name"),
              col("n_customers"), col("sum_bal"), col("gid"))
      .orderBy(col("gid"), col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** §2.4 Full cross-tabulation via CUBE: every (region, nation) subtotal
    * combination including nation-only — the audit cross-check matrix shape.
    * Same aliasing rule as [[qAggRollup]]. */
  def qAggCube(spark: SparkSession, dir: String): DataFrame = {
    val joined = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "c_acctbal")
    joined.cube(col("r_name").as("r_name_g"), col("n_name").as("n_name_g"))
      .agg(count(lit(1)).as("n_customers"),
           moneySum(col("c_acctbal")).as("sum_bal"),
           grouping_id().as("gid"))
      .select(col("r_name_g").as("r_name"), col("n_name_g").as("n_name"),
              col("n_customers"), col("sum_bal"), col("gid"))
      .orderBy(col("gid"), col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** §2.4 Explicit GROUPING SETS over MIXED dimensions — region totals,
    * market-segment totals, and the grand total in one pass (one shuffle,
    * Expand feeds a single hash aggregate; three separate groupBys would
    * scan and shuffle three times). */
  def qAggGroupSets(spark: SparkSession, dir: String): DataFrame = {
    // Rename BEFORE grouping: groupingSets matches set entries against the
    // grouping columns semantically, so aliases inside the call break the
    // match (and post-agg references to the original names would trip the
    // ambiguous-self-join detection, as in qAggRollup).
    val joined = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("r_name_g"), col("c_mktsegment").as("seg_g"),
              col("c_acctbal"))
    joined.groupingSets(Seq(Seq(col("r_name_g")), Seq(col("seg_g")), Seq()),
        col("r_name_g"), col("seg_g"))
      .agg(count(lit(1)).as("n_customers"),
           moneySum(col("c_acctbal")).as("sum_bal"),
           grouping_id().as("gid"))
      .select(col("r_name_g").as("r_name"), col("seg_g").as("seg"),
              col("n_customers"), col("sum_bal"), col("gid"))
      .orderBy(col("gid"), col("r_name").asc_nulls_first, col("seg").asc_nulls_first)
  }

  /** §2.4 Exact percentiles per group (p50/p90 spend per order status —
    * the audit/reporting distribution cuts). `percentile` is the exact
    * sort-based aggregate with linear interpolation — the same definition
    * as DuckDB's `quantile_cont`, so the oracle matches on values, unlike
    * the sketch-based `approx_percentile`. At 100 TB prefer
    * `approx_percentile` (mergeable sketch, no per-group sort); the exact
    * form is the declared oracle-able variant. */
  def qAggPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
           round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
           round(expr("percentile(o_totalprice, array(0.25, 0.75))[1]" +
                      " - percentile(o_totalprice, array(0.25, 0.75))[0]"), 4)
             .as("iqr"))
      .orderBy("o_orderstatus")

  /** §2.4 Sketch percentiles (no-oracle: the t-digest-style estimator is
    * engine-specific; RelationalSpec bounds it against [[qAggPercentile]]):
    * `approx_percentile` is the 100 TB path — a mergeable sketch with
    * map-side partials, no per-group sort of the raw values. */
  def qAggApproxPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(expr("approx_percentile(o_totalprice, 0.5, 1000)").as("p50_approx"),
           expr("approx_percentile(o_totalprice, 0.9, 1000)").as("p90_approx"))
      .orderBy("o_orderstatus")

  /** §2.4 Pivot (long→wide cross-tab): customers per (region × market
    * segment) with the segment domain pivoted to columns. The value list is
    * EXPLICIT — at scale an implicit pivot first runs a distinct scan to
    * discover the domain and caps it at `spark.sql.pivotMaxValues`; a
    * declared domain keeps the plan a single pass. */
  def qPivotSegment(spark: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .pivot("c_mktsegment", segs)
      .agg(count(lit(1)))
      .select(col("r_name") +: segs.map(s => coalesce(col(s), lit(0L)).as(s)): _*)
      .orderBy("r_name")
  }

  /** §2.4 Audit-phase referential cross-checks ([SPEC: audit]): orphan
    * foreign keys (anti-joins) and key-uniqueness checksums
    * (count − count distinct), one row per check — the warehouse-vs-source
    * consistency queries that run after the batch validation. Each check is
    * an independent keyed anti-join or map-side-combined aggregate. */
  def qAuditReferential(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    def counted(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("chk"), col("n_violations"))
    def dupKeys(name: String, df: DataFrame, keys: Seq[String]): DataFrame =
      df.agg((count(lit(1)) - countDistinct(col(keys.head), keys.tail.map(col): _*))
          .as("n_violations"))
        .select(lit(name).as("chk"), col("n_violations"))
    counted("lineitem_orphan_order",
        l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti"))
      .unionByName(counted("orders_orphan_customer",
        o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")))
      .unionByName(dupKeys("customer_dup_key", c, Seq("c_custkey")))
      .unionByName(dupKeys("orders_dup_key", o, Seq("o_orderkey")))
      .unionByName(dupKeys("lineitem_dup_line", l, Seq("l_orderkey", "l_linenumber")))
      .orderBy("chk")
  }

  /** §2.4 Column profiling (data-quality sweep a training pipeline runs
    * before ingest): per-column row count, null count, min/max, exact
    * distinct — one row per profiled column. ONE scan of the table computes
    * every measure (the previous 4-scan union read lineitem once per column
    * — 2.16 s at sf0.1; at 100 TB that is four full table reads):
    *
    *  - exact mode: `stack` the profiled columns into (col_name, v) pairs,
    *    then a two-level cascade — `groupBy(col_name, v).count` collapses to
    *    distinct values (map-side combine eats the duplication before the
    *    shuffle), and a second tiny agg over the distinct pairs yields every
    *    measure, including exact distinct as a plain `count`. No Expand: a
    *    direct multi-`countDistinct` agg plans an N+1-way Expand whose
    *    single global group degenerates to one reducer (measured 9 s — worse
    *    than the 4 scans). The cascade keeps both levels partial-aggregated
    *    and parallel.
    *  - `approx = true` is the 100 TB mode: one plain partial+final agg pass
    *    with `approx_count_distinct` (mergeable HLL, default 5% rsd — a
    *    tighter 2% rsd measured 3× slower per row for no analytic gain) —
    *    no pair explosion at all, then the wide row is exploded to
    *    presentation rows driver-free. */
  def qProfileColumns(spark: SparkSession, dir: String): DataFrame =
    profileColumns(spark, dir, approx = false)

  private val profiledCols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")

  def profileColumns(spark: SparkSession, dir: String, approx: Boolean): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    if (approx) {
      val measures = profiledCols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
            round(min(col(c)).cast("double"), 4).as(s"${c}__min"),
            round(max(col(c)).cast("double"), 4).as(s"${c}__max"),
            approx_count_distinct(col(c)).as(s"${c}__nd"))
      }
      val wide = li.agg(count(lit(1)).as("n_rows"), measures: _*)
      val rows = profiledCols.map { c =>
        struct(lit(c).as("col_name"), col("n_rows"),
               col(s"${c}__nulls").as("n_nulls"),
               col(s"${c}__min").as("min_val"), col(s"${c}__max").as("max_val"),
               col(s"${c}__nd").as("n_distinct"))
      }
      wide.select(explode(array(rows: _*)).as("p")).select("p.*").orderBy("col_name")
    } else {
      val stackExpr =
        profiledCols.map(c => s"'$c', $c").mkString(s"stack(${profiledCols.size}, ", ", ", ")")
      Tables.lineitem(spark, dir)
        .select(expr(stackExpr).as(Seq("col_name", "v")))
        .groupBy("col_name", "v").agg(count(lit(1)).as("cnt"))
        .groupBy("col_name").agg(
          sum("cnt").as("n_rows"),
          sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("n_nulls"),
          round(min(col("v")).cast("double"), 4).as("min_val"),
          round(max(col("v")).cast("double"), 4).as("max_val"),
          count(when(col("v").isNotNull, 1)).as("n_distinct"))
        .orderBy("col_name")
    }
  }

  /** §2.4 PII pseudonymization — the GDPR-style masking pass a warehouse
    * (or a training corpus carrying user-generated records) runs before
    * data leaves the trust boundary: the embedded numeric identifier is
    * replaced by a salted-hash SURROGATE (stable — the same identifier
    * always maps to the same token, so joins/dedup on the surrogate still
    * work downstream) and the display string is digit-masked. Pure per-row
    * codegen'd regexp/hash expressions — no shuffle, scales as a map-only
    * pass; the salt would be a secret in production (a literal here so the
    * oracle can restate it). */
  def qPseudonymize(spark: SparkSession, dir: String): DataFrame = {
    val id = regexp_extract(col("c_name"), "([0-9]+)", 1)
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]", "X").as("masked_name"),
        md5(concat(lit("pepper:"), id)).as("surrogate_id"),
        (length(id) > 0).as("has_id"))
      .orderBy("c_custkey")
  }

  /** §2.4 PII scrubbing — the redaction pass every corpus makes before
    * training: pattern-redact identifying spans (entity-name ids, money
    * amounts — the stand-ins this data carries for emails/phones/SSNs)
    * from a free-text blob and emit per-row REDACTION COUNTS alongside the
    * scrubbed text, so the pipeline both fixes the text and audits how
    * much it had to fix (the count distribution is the PII-density monitor
    * dashboards alert on). Pure per-row codegen regexp projection —
    * map-only, no shuffle, the same shape at any corpus size. Counts come
    * from the ORIGINAL text (redaction order cannot mask them); patterns
    * are [0-9]-class literals that parse identically under Java regex and
    * DuckDB's RE2, and the balance rides through DECIMAL(12,2) so both
    * engines render the digits identically. Complements [[qPseudonymize]]
    * (stable surrogate KEYS) with span-level text redaction. */
  def qPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val namePat = "Customer#[0-9]{9}"
    val numPat = "-?[0-9]+\\.[0-9]{2}"
    val blob = concat_ws(" ", col("c_name"), lit("bal"),
      col("c_acctbal").cast("decimal(12,2)").cast("string"), col("c_mktsegment"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), blob.as("blob"))
      .select(col("c_custkey"),
        size(regexp_extract_all(col("blob"), lit(namePat), lit(0))).as("n_name"),
        size(regexp_extract_all(col("blob"), lit(numPat), lit(0))).as("n_num"),
        regexp_replace(regexp_replace(col("blob"), namePat, "[NAME]"),
          numPat, "[NUM]").as("scrubbed"))
      .orderBy("c_custkey")
  }

  /** §2.4 Noised count release in the BINOMIAL-mechanism SHAPE — the third
    * leg of the privacy family: [[qKAnonymity]] AUDITS re-identification
    * risk, [[qPseudonymize]]/[[qPiiScrub]] FIX record-level data, this
    * releases an aggregate under additive noise. The noise shape is the
    * binomial mechanism (Dwork et al. — Binomial(k, ½) noise approximates
    * the Gaussian mechanism's (ε, δ)-DP with σ = √(k/4) ≈ 2.83 at k = 32
    * bits): per group, noise = popcount of the first 32 bits of a seeded
    * md5 of the group key, centered at 16.
    *
    * HONESTY — what this is and is not: with the default PUBLIC fixture
    * seed, the draw is a deterministic function of the PUBLICLY RELEASED
    * group key, so any reader holding the code recomputes the noise and
    * subtracts it exactly — ε is unbounded and the release provides NO
    * privacy. The default exists so the DuckDB oracle can re-derive the
    * identical release (the repo's determinism discipline applied to the
    * noise SHAPE, not to a privacy guarantee). A private release requires
    * `seed` to be SECRET and fresh per release (a per-release random nonce
    * held by the curator, never published and never reused); rotation alone
    * is insufficient if old seeds leak. DpNoiseSpec asserts the noise is
    * distributed as Binomial(32, ½) across many groups (mean 16, var 8).
    *
    * Post-agg map-only projection over |groups| rows; negative releases
    * are kept (clamping is post-processing, allowed but not applied). */
  def qDpCounts(spark: SparkSession, dir: String,
                seed: String = "dp:"): DataFrame = {
    val pop = (1 to 8).map { i =>
      expr(s"CAST(substr('0112122312232334', " +
        s"locate(substr(h, $i, 1), '0123456789abcdef'), 1) AS INT)")
    }.reduce(_ + _)
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      // the "|" delimits SEED from GROUP KEY in the hash input (ADVICE r12):
      // without it, seed "a" with key 12 and seed "a1" with key 2 hash the
      // same bytes, so a cross-release seed rotation could silently reuse
      // noise for aliasing groups
      .withColumn("h", md5(concat(lit(seed), lit("|"),
        col("c_nationkey").cast("string"), lit(":"), col("c_mktsegment"))))
      .select(col("c_nationkey"), col("c_mktsegment"),
        (col("n") + pop - 16).cast("long").as("n_released"))
      .orderBy("c_nationkey", "c_mktsegment")
  }

  /** §2.4 k-anonymity audit — the governance check a dataset passes before
    * release: group the table by its quasi-identifier tuple (nation ×
    * segment × coarse balance bucket) and emit every equivalence class
    * smaller than k=5, i.e. the rows an adversary joining on public
    * attributes could re-identify; singleton classes are flagged as unique
    * rows. One hash aggregation with map-side partials + a HAVING filter —
    * the violating-class output is bounded by the QI-space cardinality,
    * never the table size, so the shape holds at any SF. Complements
    * [[qPseudonymize]] (fixing identifiers) with the measurement of
    * whether the remaining attributes still leak identity. */
  def qKAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("int").as("bal_bucket"))
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < 5)
      .withColumn("unique_row", col("class_size") === 1)
      .orderBy("c_nationkey", "c_mktsegment", "bal_bucket")

  /** §2.4 Batch-validation / DImessages shape: per-table row counts plus a
    * per-table alert count (invalid-value rules), one row per table — the
    * TPC-DI batch validation query that runs after every load [SPEC:
    * DImessages]. Each branch is an independent parallel scan with a
    * map-side-combined aggregate; the union is |tables| rows. */
  def qBatchValidation(spark: SparkSession, dir: String): DataFrame = {
    def chk(name: String, alert: org.apache.spark.sql.Column): DataFrame =
      Tables.load(spark, dir, name)
        .agg(count(lit(1)).as("n_rows"),
             sum(when(alert, 1).otherwise(0)).cast("bigint").as("n_alerts"))
        .select(lit(name).as("tbl"), col("n_rows"), col("n_alerts"))
    chk("customer", col("c_acctbal").isNull)
      .unionByName(chk("orders", col("o_totalprice") <= 0.0))
      .unionByName(chk("lineitem",
        col("l_quantity") <= 0.0 || col("l_discount") < 0.0 || col("l_discount") > 1.0))
      .unionByName(chk("supplier", col("s_acctbal").isNull))
      .unionByName(chk("part", col("p_retailprice") <= 0.0))
      .orderBy("tbl")
  }

  /** §2.6 Global top-k with deterministic tie-break → TakeOrderedAndProject:
    * no global sort, each partition keeps k rows, driver merges k·p rows. */
  def qSortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** §2.6 Multi-column sort with explicit null placement (Spark and DuckDB
    * default null order differ — both sides spell it out). */
  def qSortNulls(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .withColumn("seg_nulled", nullif(col("c_mktsegment"), lit("BUILDING")))
      .select("c_custkey", "seg_nulled", "c_acctbal")
      .orderBy(col("seg_nulled").asc_nulls_first, col("c_acctbal").desc, col("c_custkey"))

  /** §2.7 Batch union (Batch1 ∪ Batch2 ∪ Batch3 / FINWIRE quarter concat) with
    * union-distinct semantics. */
  def qUnionBatches(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderstatus")
      .unionByName(
        o.filter(col("o_totalprice") > 200000.0)
          .select("o_orderkey", "o_orderstatus"))
      .distinct()
      .orderBy("o_orderkey")
  }

  /** §2.7 Set difference (audit: source keys absent from warehouse). */
  def qExcept(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_custkey"))
      .except(Tables.orders(spark, dir).filter(col("o_totalprice") > 250000.0)
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  /** §2.7 Set intersection: customers present in both the F-status and
    * O-status order batches. */
  def qIntersect(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  /** §2.7 Multiset difference (EXCEPT ALL): order keys per customer with
    * multiplicity — the batch-reconciliation form where HOW MANY rows went
    * missing matters, not just which keys (a plain EXCEPT would hide a
    * partial loss of duplicate-keyed rows). One hash shuffle per side on
    * the compare key. */
  def qExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_totalprice") > 150000.0).select(col("o_custkey"))
      .exceptAll(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  /** §2.7 Multiset intersection (INTERSECT ALL): per-key common multiplicity
    * across two order batches. */
  def qIntersectAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersectAll(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  /** §2.4 Join-key skew profiling: the count-of-counts histogram over
    * per-key row counts (power-of-two buckets) — the pre-flight audit run
    * before sizing a 100 TB join: how many keys live in each frequency
    * band, and what share of all rows the hot bands carry (the numbers
    * that decide between a plain shuffle join, AQE skew splitting, and
    * manual salting — see `q_skew_salt`). Two hash aggregations, both with
    * map-side partials; the bucket id is `length(bin(n))` =
    * floor(log2 n)+1 — pure integer/string ops, bit-identical across
    * engines where a libm log2 could round differently at band edges. */
  def qSkewProfile(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val t = c.agg(sum(col("n")).as("total"))
    c.groupBy(length(bin(col("n"))).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_keys"), min(col("n")).as("min_count"),
           max(col("n")).as("max_count"), sum(col("n")).as("sn"))
      .crossJoin(broadcast(t))
      .withColumn("row_share",
        floor(col("sn").cast("double") / col("total") * 1e6) / 1e6)
      .select("bucket", "n_keys", "min_count", "max_count", "row_share")
      .orderBy("bucket")
  }

  /** §2.4 OHLC bars: open/close via min_by/max_by on event time, high/low
    * via plain min/max, per (user, day) — the FactMarketHistory daily-bar
    * shape [SPEC: FactMarketHistory]. min_by/max_by need a unique ordering
    * key for determinism: (user_id, ts) is unique in events (verified), the
    * same precondition DuckDB's arg_min/arg_max oracle relies on. One hash
    * aggregation, map-side partials carry (argmin, argmax, min, max, n). */
  def qAggOhlc(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max_by(col("value"), col("ts")).as("close"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        count(lit(1)).as("n"))
      .orderBy("user_id", "day")

  /** §2.4 Histogram: fixed-width value bucketing by floor division — the
    * distribution-profiling shape. Bucket id is pure map-side arithmetic;
    * the aggregate shuffles one row per bucket. */
  def qHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(floor(col("o_totalprice") / 50000.0).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", col("bucket") * 50000)
      .select("bucket", "lo", "n")
      .orderBy("bucket")

  /** §2.4 Statistical moments per group — mean/variance/correlation derived
    * from exact decimal power sums (n, Σx, Σy, Σx², Σy², Σxy) instead of the
    * built-in `corr`/`var_pop`: double summation is order-dependent, so the
    * built-ins can differ across engines (and across partitionings!) in the
    * last ulp; decimal sums are exact and order-independent, making the
    * derived moments bit-reproducible. The sums are one hash aggregation
    * with map-side partials — also exactly the mergeable-statistics shape a
    * 100 TB profiling pass wants. */
  def qStatsMoments(spark: SparkSession, dir: String): DataFrame = {
    def d24(c: Column) = c.cast("decimal(24,6)")
    def d30(c: Column) = c.cast("decimal(30,6)")
    def snap(c: Column, s: Double) = floor(c * s) / s
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    val s = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(d24(x)).cast("double").as("sx"),
        sum(d24(y)).cast("double").as("sy"),
        sum(d30(x * x)).cast("double").as("sxx"),
        sum(d30(y * y)).cast("double").as("syy"),
        sum(d30(x * y)).cast("double").as("sxy"))
    s.select(
        col("l_returnflag"), col("n"),
        snap(col("sx") / col("n"), 1e4).as("mean_qty"),
        snap((col("sxx") - col("sx") * col("sx") / col("n")) / col("n"), 1e4)
          .as("var_qty"),
        snap((col("sxy") - col("sx") * col("sy") / col("n"))
          / sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
               * (col("syy") - col("sy") * col("sy") / col("n"))), 1e6)
          .as("corr_qp"))
      .orderBy("l_returnflag")
  }

  /** §2.4/§2.11 Per-group top-k via a custom typed `Aggregator`
    * ([[graft.expr.TopKLongsAgg]]) — top-3 event amounts (in cents) per
    * user, emitted as a comma-joined descending string. Unlike the window
    * formulation (`row_number() <= k`, which shuffles and sorts every raw
    * row), the aggregator's k-bounded buffer participates in map-side
    * partial aggregation: the shuffle carries at most k longs per group —
    * the partial-top-k pattern that matters at 100 TB. Cents via
    * floor(x*100 + 0.5): values carry 2 decimals, so the scaled double is
    * within 1 ulp of an integer and floors identically in both engines. */
  def qAggTopk(spark: SparkSession, dir: String): DataFrame = {
    val top3 = udaf(new graft.expr.TopKLongsAgg(3))
    Tables.events(spark, dir)
      .select(col("user_id"), floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(concat_ws(",",
        transform(top3(col("cents")), _.cast("string"))).as("top3"))
      .orderBy("user_id")
  }

  /** §2.11(c) Per-group top-k as a WHOLE-ROW custom operator
    * ([[graft.plans.TopKPerGroup]]): top-3 lineitems by price per supplier,
    * planned by the injected [[graft.plans.GraftStrategy]] as
    * partial-heap → one hash exchange → final-heap — the shuffle carries
    * ≤ k rows per (group × map partition) instead of the whole table, and
    * nothing ever fully sorts (contrast the window form the ORACLE uses:
    * `row_number() OVER (...) <= 3`, an independent formulation of the same
    * semantics). The (price desc, orderkey, linenumber) ordering is total,
    * so both engines cut identical rows. Plan + shuffle-bound contracts in
    * TopKPlanSpec. */
  def qTopkPlanNative(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    graft.plans.TopK.perGroup(li, Seq("l_suppkey"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
      .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
               col("l_orderkey"), col("l_linenumber"))
  }

  /** §2.1 SQL-text entry path: the same engine drives `spark.sql(...)` over
    * registered temp views — a CTE + join + aggregate written once in ANSI
    * SQL that runs verbatim in both Spark and DuckDB (the oracle IS this
    * string). Demonstrates that a reference user can bring raw SQL, not
    * just the DataFrame API, and Catalyst plans it identically. */
  def qSqlText(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql(graft.Oracle.sql("q_sql_text"))
  }

  /** §2.1/§2.3 Correlated LATERAL subquery (same shared-string pattern as
    * [[qSqlText]]): top-2 customers per nation via a per-row dependent
    * subquery with ORDER BY + LIMIT — the lateral/top-n-apply shape.
    * Catalyst decorrelates it into a ranked window join; the inner sort key
    * ends in the unique name so the top-2 cut is deterministic. */
  def qSqlLateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    spark.sql(graft.Oracle.sql("q_sql_lateral"))
  }

  /** §2.1 RECURSIVE CTE (same shared-string pattern as [[qSqlText]] — the
    * oracle IS the query): a month spine generated by recursion from the
    * order-date bounds, left-joined to the monthly revenue rollup so gap
    * months surface as explicit zero rows — the calendar-densification shape
    * reporting pipelines need before any time-series smoothing.
    *
    * Scale shape: the recursion runs over the SPINE (bounded metadata),
    * never over the fact table; the fact side is one ordinary hash rollup,
    * and the spine⋈rollup join is a broadcast of the tiny spine. Spark
    * executes ONE JOB PER RECURSION LEVEL, so the spine recurses at YEAR
    * granularity with a 12-row month expansion — measured 8× faster than
    * the month-level recursion on identical output (depth ~8 vs 80
    * sequential micro-jobs; depth, not row count, is the latency driver).
    * The recursion is structurally bounded by the hi-year predicate; the
    * level guard is raised from Spark's default 100 to 1,000 — year-grain
    * recursion makes 100 levels a century of data (ample), but the default
    * would be a silent time bomb against pathological testdata, and 1,000
    * still fails a runaway fast. The returned DataFrame is LAZY, so a
    * set-then-restore around this call would restore the default before
    * execution reads the conf — instead the query is planned in an
    * ISOLATED child session (`newSession`: shared SparkContext and cached
    * data, separate SQLConf + temp views): the raised limit lives only in
    * the child, execution of the returned child-bound DataFrame reads it
    * there, and the CALLER's session conf — and every later recursive CTE
    * in it — is untouched (spec-asserted). */
  def qSqlRecursive(spark: SparkSession, dir: String): DataFrame = {
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.cteRecursionLevelLimit", "1000")
    Tables.orders(scoped, dir).createOrReplaceTempView("orders")
    scoped.sql(graft.Oracle.sql("q_sql_recursive"))
  }

  /** §2.1 Z-ORDER LAYOUT KEY — multi-dimensional clustering for scan
    * pruning: the Morton code interleaves the low 16 bits of two keys
    * (customer, order-month) into one BIGINT sort key, so range-
    * partitioning/sorting by it clusters rows close in BOTH dimensions
    * into the same files — min/max file statistics then prune 2-D range
    * predicates where a single-column sort only prunes its own column
    * (the lakehouse OPTIMIZE ZORDER technique). At 100 TB layout is the
    * cheapest query accelerator there is: it costs one write and pays on
    * every subsequent scan.
    *
    * Interleaving RAW keys would let the wider dimension's bits dominate
    * the top of the code (customer spans ~11 varying bits here, the month
    * index ~7 — the first three partition cuts would all be customer cuts
    * and months would never cluster), so each dimension is first quantized
    * onto a common 256-cell grid from its own observed bounds — exactly
    * what production ZORDER implementations do via per-column range ids.
    * The bounds are a 1-row broadcast; the grid math is exact integer
    * division in both engines.
    *
    * The code itself is the native codegen [[graft.expr.Morton32]] (pure
    * integer bit math, bit-identical across engines; the oracle restates
    * it as a 32-term sum of disjoint powers of two). This query emits the
    * layout ORDER — each row's grid coordinates and z-key in z order;
    * WarehouseSpec measures the actual clustering effect: per-partition
    * span sums of a z-ranged layout vs a single-key layout. */
  /** The shared (orderkey, grid coords, z key) frame of the two z-order
    * queries: bounds as a 1-row broadcast, exact integer grid division,
    * codegen morton32 — all map-side. */
  private def zGrid(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val keys = Tables.orders(spark, dir).select(col("o_orderkey"),
      col("o_custkey").cast("long").as("xr"),
      expr("cast(year(o_orderdate) * 12 + month(o_orderdate) - 1 as bigint)")
        .as("yr"))
    val bounds = keys.agg(min("xr").as("xlo"), max("xr").as("xhi"),
                          min("yr").as("ylo"), max("yr").as("yhi"))
    keys.crossJoin(broadcast(bounds))
      .withColumn("xg", expr("cast((xr - xlo) * 256 div (xhi - xlo + 1) as int)"))
      .withColumn("yg", expr("cast((yr - ylo) * 256 div (yhi - ylo + 1) as int)"))
      .withColumn("zval", call_function("morton32", col("xg"), col("yg")))
      .select("o_orderkey", "xg", "yg", "zval")
  }

  def qZorderLayout(spark: SparkSession, dir: String): DataFrame =
    zGrid(spark, dir).orderBy("zval", "o_orderkey")

  /** §2.1 Z-RANGE PROBE — the READ side of the z-order layout: a 2-D grid
    * box query ([64..191] × [32..95] in customer/month grid cells) answered
    * through [[graft.etl.ZOrder.ranges]]' quadtree decomposition of the box
    * into a handful of CONTIGUOUS z-intervals. The filter is a small OR of
    * `zval BETWEEN` predicates — on a z-sorted table these are range scans
    * that file/row-group min-max statistics skip on, where the raw 2-D
    * predicate on the unsorted table reads everything. No residual filter:
    * the decomposition covers the box EXACTLY (PrimitiveProps pins exact
    * area + membership round-trip), so z-membership ⟺ box membership.
    * The oracle is the INDEPENDENT formulation — the plain 2-D predicate —
    * which is precisely the semantic contract of the rewrite. */
  def qZorderProbe(spark: SparkSession, dir: String): DataFrame = {
    val rs = graft.etl.ZOrder.ranges(64, 191, 32, 95)
    val pred = rs.map { case (lo, hi) => col("zval").between(lo, hi) }
      .reduce(_ || _)
    zGrid(spark, dir).filter(pred).orderBy("o_orderkey")
  }

  /** §2.3 Full outer join: reconcile two independently-filtered views of the
    * customer base (the warehouse-vs-source reconciliation shape — rows only
    * in one side surface as has_* = false). Both sides shuffle on the key;
    * at 100 TB this is the one join family where neither side can broadcast,
    * so it stays a hash-partitioned sort-merge by construction. */
  def qJoinFull(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 150000.0)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
    val c = Tables.customer(spark, dir).filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey"), col("c_name"))
    c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_custkey").isNotNull.as("has_cust"),
        col("o_custkey").isNotNull.as("has_ord"),
        coalesce(col("n_ord"), lit(0L)).as("n_ord"))
      .orderBy("custkey")
  }

  /** §2.4 Order-sensitive aggregation: collect_list sorted then joined —
    * the string_agg / ARRAY_AGG(... ORDER BY) shape audits and report
    * exports use. Sorting INSIDE the aggregate value (array_sort after
    * collect_list) keeps the aggregation itself order-independent, so
    * map-side partials still apply and the result is deterministic under
    * any partitioning — the property that makes this safe at 100 TB (the
    * per-group payload is bounded by group size, not table size). */
  def qAggCollect(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(
        array_join(array_sort(collect_list(col("c_name"))), ",").as("names"),
        count(lit(1)).as("n"))
      .orderBy("c_nationkey")

  /** §2.2 Unpivot (wide → long melt): one row per (key, measure) — the
    * EAV/metric-table export shape. Narrow transform, no shuffle; the
    * measure columns must share a type so both are cast to double. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_size").cast("double").as("size"),
              col("p_retailprice").as("retail"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retail")),
               "measure", "val")
      .orderBy("p_partkey", "measure")

  /** §2.3 Salted join — the skew-mitigation pattern: the fact side derives a
    * deterministic salt from a uniform column, the dimension side is
    * replicated once per salt value, and the join key becomes
    * (business key, salt), splitting any hot key's rows across `salts`
    * reducers. Deterministic salt (orderkey mod 8, not rand()) keeps the
    * result oracle-checkable — the output equals the unsalted join, which is
    * exactly the correctness contract of salting. AQE's skew-join handles
    * moderate skew automatically; explicit salting is the escape hatch for
    * the pathological single-key case where one key exceeds an executor. */
  def qSkewSalt(spark: SparkSession, dir: String): DataFrame = {
    val salts = 8
    val li = Tables.lineitem(spark, dir)
      .withColumn("salt", pmod(col("l_orderkey"), lit(salts.toLong)).cast("int"))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
      .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
    li.join(sup, li("l_suppkey") === sup("s_suppkey") && li("salt") === sup("salt"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"), moneySum(col("l_quantity")).as("sum_qty"))
      .orderBy("s_nationkey")
  }
}
