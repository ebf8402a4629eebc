package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning-invariance contract (SURVEY.md §5.3): every cross-engine
  * exactness trick in the engine — decimal-snap sums, integer micro-unit
  * snapping BEFORE summation, md5 hashing, range-sort + zipWithIndex —
  * exists so results cannot depend on HOW the data was partitioned. This
  * suite enforces that directly: the same query on the same data must
  * return byte-identical rows under a radically different
  * `spark.sql.shuffle.partitions` (3 vs the suite's 32), which reshuffles
  * every aggregation/join/window layout. A query that drifts here would
  * also drift between cluster sizes at 100 TB — and between Spark and the
  * DuckDB oracle. */
class DeterminismSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val alt = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 3)
    s
  }

  // queries whose internals are most partition-sensitive: double-derived
  // aggregations, sketches, global orderings, iterative CC
  private val sensitive: Seq[String] = Seq(
    "q_stats_moments",    // decimal power sums -> derived moments
    "q_agg_hash",         // money sums
    "q_heavy_hitters",    // MG sketch merge tree changes with partitioning
    "q_lm_perplexity",    // micro-snapped nll sums + percentile cut
    "q_embed_outliers",   // integer micro-unit centroids
    "q_mix_interleave",   // closed-form global positions (integer cross-multiply)
    "q_mix_temperature",  // micro-snapped sqrt weight sums
    "q_dedup_groups",     // iterative min-label CC
    "q_win_running",      // decimal running sums over windows
    "q_interpolate",      // ignoreNulls window neighbors + interp arithmetic
    "q_source_budget",    // per-source running token sums in hash order
    "q_cross_source_keep", // CC + priority window survivor election
    "q_bm25",             // snapped idf + integer micro score sums
    "q_pagerank",         // iterative integer nano-unit rank sums
    "q_graph_triangles",  // degree-ordered wedge closure, integer counts
    "q_token_bpe",        // vocabulary BPE pass + per-doc integer sums (r9)
    "q_hybrid_rrf",       // two arm cuts + integer-micro rank fusion (r9)
    "q_event_anomaly",    // decimal(38,0) variance test terms (r9)
    "q_profile_columns",  // stack + cascade exact-distinct rewrite (r9)
    "q_anomaly_mad",      // exact half-integer medians -> integer MAD cut (r10)
    "q_embed_pca",        // snapped gram collect -> driver eigen -> micro projection (r10)
    "q_bpe_train",        // top-V cap total order + deterministic merge tie-break (r10)
    "q_zorder_layout")    // bounds broadcast -> exact integer grid + total z sort (r10)

  sensitive.foreach { name =>
    test(s"$name is byte-identical under shuffle.partitions 32 vs 3") {
      val base = SparkEntry.queries(name)(spark, TestSpark.sfDir)
        .collect().map(_.toString).toSeq
      val re = SparkEntry.queries(name)(alt, TestSpark.sfDir)
        .collect().map(_.toString).toSeq
      assert(base === re, s"$name drifted under a different partitioning")
      assert(base.nonEmpty)
    }
  }

  // AQE rewrites plans at runtime (coalesced partitions, runtime join
  // strategy swaps, skew splits) — none of which may change RESULTS
  private lazy val noAqe = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  Seq("q_stats_moments", "q_heavy_hitters", "q_dedup_groups").foreach { name =>
    test(s"$name is byte-identical with AQE disabled") {
      val base = SparkEntry.queries(name)(spark, TestSpark.sfDir)
        .collect().map(_.toString).toSeq
      val re = SparkEntry.queries(name)(noAqe, TestSpark.sfDir)
        .collect().map(_.toString).toSeq
      assert(base === re, s"$name drifted when AQE replanning was disabled")
    }
  }
}
