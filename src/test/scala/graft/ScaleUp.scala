package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** 10× scale-regression smoke (r14 judge #3): MEASURE the 100-TB scale
  * claim instead of arguing it from plan shape alone.
  *
  * The harness materializes a replicated `FACTOR`× copy of sf0.1 (union of
  * `FACTOR` key-shifted copies — see [[replicate]] for how skew and
  * duplicate-group structure are preserved), times the slowest oracled
  * queries at both scales, and asserts two contracts per query:
  *
  *  1. **wall-time**: `t(10×) ≤ RatioCap × max(t(1×), Floor)` with
  *     `RatioCap = 15` — a linear operator shows ~10× (plus fixed
  *     overhead amortization it shows LESS), a quadratic one ~100×;
  *  2. **no plan flips**: the post-AQE shuffle-exchange count at 10× stays
  *     within the budget frozen in `plan_shuffles.tsv` — the count a
  *     statistics-driven planner could silently raise at scale (the
  *     classic failure: a planner-broadcast side outgrows the threshold
  *     and the join degrades to a shuffle nobody reviewed).
  *
  * Replication, not generation: the driver's testdata generator is not
  * available here, so scale comes from unioning key-shifted copies. Each
  * copy's WITHIN-copy structure (key skew, duplicate groups, time
  * distribution, source mix) is bit-identical to sf0.1; the shifts keep
  * copies key-disjoint so joins/graphs/CC stay per-copy and volume scales
  * exactly linearly in the copy count.
  *
  * Run (writes the replica under /tmp, ~170 MB at factor 10):
  *   sbt 'Test/runMain graft.ScaleUp'
  * Results land in SCALE.md (committed) — one row per query with both
  * times, the growth ratio, and the 10× shuffle count vs budget.
  * Exit 1 when any contract fails.
  */
object ScaleUp {
  private val Floor = 0.5      // sec; below this, scheduling overhead dominates
  private val RatioCap = 15.0  // t(10x) / t(1x) cap for a FACTOR=10 replica
  private val Factor = 10

  /** The slowest ORACLED queries by the r13 driver sweep (the least
    * contended recent full measurement), spanning every super-linear-risk
    * family: iterative graph (pagerank, triangles), the curation funnel,
    * connected-components dedup (groups/keep/cross-source), set-similarity
    * join (containment), range/interval joins, full windows, the TPC-DI
    * ETL composition, recursion, and a lineitem-scale scalar map as the
    * linear control. */
  val Headline: Seq[String] = Seq(
    "q_pagerank", "q_corpus_curate", "q_curation_audit", "q_win_range_frame",
    "q_math_funcs", "q_cross_source_keep", "q_dedup_groups", "q_containment",
    "q_dedup_keep", "q_warehouse_etl", "q_interpolate", "q_graph_triangles",
    "q_join_conditional_key", "q_join_range_scd2", "q_sql_recursive",
    // the core 100-TB dedup/similarity claims, measured where they live:
    // banded MinHash (pair expansion risk), embedding near-dup (bucketed
    // cosine), and the exhaustive top-k scan (the linear ANN baseline)
    "q_dedup_minhash", "q_semdedup", "q_knn_cosine")

  /** ADJUDICATED plan flips: extra shuffle exchanges ALLOWED at 10× beyond
    * the sf0.001 budget, each with the review that admitted it. These are
    * the broadcast→sort-merge conversions whose flipped side is genuinely
    * DATA-SCALED — the join must shuffle at 100 TB, and the sf0.001
    * broadcast was the small-data plan, not the scale plan. Anything NOT
    * in this map that exceeds its budget is an unreviewed regression and
    * fails the gate. (The counterexample that did NOT get an allowance and
    * was fixed instead: q_interpolate's grid-bounded fill frame now
    * broadcasts explicitly.) */
  val AdjudicatedExtra: Map[String, (Int, String)] = Map(
    "q_pagerank" -> (4,
      "rank and edge sides are data-scaled; once broadcast no longer fits " +
        "each of the 5 rounds exchanges both (the Pregel round shape). The " +
        "measured alternatives and the bucketed-edge deployment answer are " +
        "documented at the edgesW pin in queries/Graph.scala"),
    "q_corpus_curate" -> (1,
      "canonical-group map-back joins the corpus-sized CC-drop set on doc_id — data-scaled, shuffles at scale"),
    "q_curation_audit" -> (1,
      "shares q_corpus_curate's survivalFlags frame — same data-scaled membership join"),
    "q_warehouse_etl" -> (2,
      "SCD2 point-in-time resolve: DimCustomer grows with the corpus, broadcast side flips to SMJ (both sides exchange)"),
    "q_graph_triangles" -> (2,
      "wedge-closure joins against the data-scaled canonical edge set — the O(m^1.5) shape shuffles at scale by design"))

  /** Key-shift offsets. BIGINT surrogate keys move by `i·KeyOff` (far above
    * any generated key); the small INT dimension keys by `i·DimOff` (stays
    * in int range: 9·1000 + 24). */
  private val KeyOff = 100000000L
  private val DimOff = 1000

  /** Write a `copies`× replica of `srcDir` to `outDir`.
    *
    * Per-copy perturbations beyond the key shifts — both exist to keep the
    * DUPLICATE-GROUP SIZE DISTRIBUTION of sf0.1 intact (exact replication
    * would turn every former singleton document into a 10-member
    * cross-copy near-dup group, inflating banded candidate-pair output
    * ~45× — a quadratic distortion of the replication method, not of any
    * operator under test):
    *
    *  - `documents.text`: copies 1..N−1 get a per-copy CHARACTER-RING
    *    ROTATION (`translate` over a 10-letter ring — 9 distinct
    *    non-identity permutations): length, whitespace, token count, and
    *    within-copy dup structure are preserved exactly, while every
    *    shingle/minhash changes cross-copy;
    *  - `embeddings.embedding`: copies 1..N−1 get a per-copy DIAGONAL ±1
    *    SIGN FLIP (element j negated when `hash(copy, j)` is odd): norms
    *    and all within-copy cosines are preserved exactly (cos(Sx,Sy) =
    *    cos(x,y) for any ±1 diagonal S), cross-copy cosines scramble.
    *
    * Copy 0 is byte-identical to sf0.1. */
  def replicate(spark: SparkSession, srcDir: String, outDir: String,
                copies: Int = Factor): Unit = {
    // key columns per table: every *key column moves in lockstep so
    // referential joins stay intact within a copy and disjoint across
    val bigKeys: Map[String, Seq[String]] = Map(
      "region" -> Nil, "nation" -> Nil,
      "customer" -> Seq("c_custkey"), "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"), "embeddings" -> Seq("vec_id"))
    val dimKeys: Map[String, Seq[String]] = Map(
      "region" -> Seq("r_regionkey"),
      "nation" -> Seq("n_nationkey", "n_regionkey"),
      "customer" -> Seq("c_nationkey"), "supplier" -> Seq("s_nationkey"))
      .withDefaultValue(Nil)

    // 10-character substitution ring: rotations 1..9 are all DISTINCT
    // non-identity permutations (a 5-vowel ring would make copy 5 the
    // identity again — an exact cross-copy duplicate)
    val ring = "aeioustnrl"
    def rotated(i: Int): String = {
      val r = i % ring.length
      ring.substring(r) + ring.substring(0, r)
    }

    Files.createDirectories(Paths.get(outDir))
    for (t <- Tables.names) {
      val src = spark.read.parquet(s"$srcDir/$t.parquet")
      val shifted = (0 until copies).map { i =>
        var df = src
        for (k <- bigKeys(t))
          df = df.withColumn(k, col(k) + lit(i * KeyOff))
        for (k <- dimKeys(t))
          df = df.withColumn(k, (col(k) + lit(i * DimOff)).cast("int"))
        if (t == "documents" && i > 0)
          df = df.withColumn("text",
            translate(col("text"), ring + ring.toUpperCase,
              rotated(i) + rotated(i).toUpperCase))
        if (t == "embeddings" && i > 0)
          df = df.withColumn("embedding", expr(
            s"transform(embedding, (x, j) -> " +
            s"cast(if(pmod(hash($i, j), 2) = 0, x, -x) as float))"))
        df
      }
      shifted.reduce(_.union(_))
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_scale10"

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!Files.isDirectory(Paths.get(s"$outDir/lineitem.parquet")) ||
        sys.env.contains("SPARK_GRAFT_SCALE_FORCE")) {
      println(s"[scale-up] materializing ${Factor}x replica of $srcDir -> $outDir")
      replicate(spark, srcDir, outDir)
    } else println(s"[scale-up] reusing replica at $outDir")

    def time(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(); (1 to 2).map(_ => once()).min
    }

    // Dev aid while adjudicating one flip: SPARK_GRAFT_SCALE_ONLY=q_a,q_b
    // restricts the sweep (mirrors Bench/Verify's _ONLY vars). The
    // committed SCALE.md always comes from a full unfiltered run.
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val measured = Headline.filter(q => only.forall(_.contains(q)))

    val budgets = PlanBudgets.load()
    case class Row(q: String, t1: Double, t10: Double, ratio: Double,
                   shuffles10: Int, budget: Int) {
      def allowed: Int = budget + AdjudicatedExtra.get(q).map(_._1).getOrElse(0)
      def timeOk: Boolean = ratio <= RatioCap
      def planOk: Boolean = shuffles10 <= allowed
    }
    val rows = measured.map { q =>
      val t1 = time(q, srcDir)
      val t10 = time(q, outDir)
      // post-AQE shuffle count at 10x, measured on a fresh evaluation
      val df = SparkEntry.queries(q)(spark, outDir)
      df.write.format("noop").mode("overwrite").save()
      val sh = PlanBudgets.shuffleCount(df.queryExecution.executedPlan)
      val r = Row(q, t1, t10, t10 / math.max(t1, Floor), sh, budgets(q))
      println(f"[scale-up] ${r.q}%-24s t1=${r.t1}%6.2f t10=${r.t10}%7.2f " +
        f"ratio=${r.ratio}%5.1f (cap $RatioCap) shuffles=${r.shuffles10}%d/" +
        f"${r.allowed}%d ${if (r.timeOk && r.planOk) "ok" else "VIOLATION"}%s")
      r
    }

    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val bad = rows.filterNot(r => r.timeOk && r.planOk)
    val md = new StringBuilder
    md ++= s"| query | t(sf0.1) s | t(${Factor}x) s | growth | cap | shuffles@${Factor}x | allowed (budget+adj) |\n"
    md ++= "|---|---|---|---|---|---|---|\n"
    rows.foreach { r =>
      md ++= s"| `${r.q}` | ${f(r.t1)} | ${f(r.t10)} | ${f(r.ratio)}× " +
        s"| ${f(RatioCap)}× | ${r.shuffles10} | ${r.allowed} (${r.budget}+" +
        s"${r.allowed - r.budget}) |\n"
    }
    println(md)
    println(s"""{"metric":"scale_up","factor":$Factor,"queries":${rows.length},"violations":${bad.length}}""")
    spark.stop()
    if (bad.nonEmpty) { bad.foreach(r => System.err.println(s"[scale-up] VIOLATION ${r.q}")); sys.exit(1) }
  }
}
