package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide physical-plan invariants over EVERY declared query
  * (SURVEY.md §4): the 100-TB contract is that no query may plan an
  * all-pairs join, and hot paths must stay inside whole-stage codegen.
  * `CartesianProduct` is banned outright; `BroadcastNestedLoopJoin` is
  * allowed only where the build side is a broadcast single-row probe (the
  * knn/jaccard probe pattern), never as a fallback for a missed equi-join. */
class PlanAuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Queries whose plan legitimately contains a bounded-build broadcast
    * nested loop: a scalar or small fixed probe set (vector(s) or gram-set
    * size) joined to every row — never a data-sized side. */
  private val oneRowProbeBnlj = Set(
    "q_knn_cosine", "q_knn_cosine_lsh", "q_knn_cosine_ivf", "q_knn_cosine_int8",
    "q_knn_cosine_pq", // 1-row probe broadcast in the exact re-rank (r9)
    "q_knn_cosine_ivfpq", // 1-row probe broadcast in the exact re-rank (r9)
    "q_ngram_jaccard",
    "q_tfidf", "q_label_balance", "q_mix_temperature", // corpus-total 1-row cross joins
    "q_bm25", "q_pagerank", // 1-row corpus-stats / node-count broadcasts
    "q_mix_interleave", // 1-row per-source-stats array broadcast (r8)
    "q_word_pmi", "q_skew_profile", // 1-row totals broadcasts
    "q_lm_perplexity", // 1-row corpus-total and P90 broadcasts
    "q_lm_perplexity2", // same 1-row corpus-total/P90 broadcasts, bigram form
    "q_interpolate", // |groups| × 1-row-exploded day-range spine cross
    "q_knn_batch", // m-row probe batch (bounded), broadcast
    "q_hybrid_rrf", // inherits its arms' 1-row probe/stats broadcasts (r9)
    "q_mmr_rerank", // 1-row probe broadcast in the relevance stage (r16)
    "q_warehouse_etl", // DImessages funnel: six 1-row audit aggs cross-joined (r10)
    "q_embed_covariance", // 1-row count cell of the gram frame, broadcast (r10)
    "q_hard_negatives", // m-row anchor slice broadcast, label-mismatch residual (r10)
    "q_quality_nb", // 1-row class-totals broadcast, same class as q_lm_perplexity (r10)
    "q_sample_decay", // 1-row max-ts broadcast (r10)
    "q_zorder_layout", // 1-row grid-bounds broadcast (r10)
    "q_zorder_probe",  // same 1-row grid-bounds broadcast (r10)
    "q_sql_recursive", // 12-row month expansion × year spine + 1-row bounds (r10)
    "q_scan_csv", // two 1-row digest frames cross-joined for the audit (r15)
    "q_scan_fixedwidth") // same 1-row digest crosses, one per record type (r15)

  // One evaluation pass over the full inventory; the audits read the
  // final (post-AQE) plans from it — as a string for the structural bans,
  // as a tree-walked shuffle count for the budget gate. collect() — not a
  // noop write — because a write spawns its OWN query execution: the
  // DataFrame's queryExecution would stay un-finalized (isFinalPlan=false,
  // no codegen stars).
  private lazy val plans: Seq[(String, String, Int, Int)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val df = fn(spark, TestSpark.sfDir)
      df.collect()
      val exec = df.queryExecution.executedPlan
      (name, exec.toString, PlanBudgets.shuffleCount(exec),
        unpartitionedWindows(exec))
    }

  /** Count WindowExec nodes with an EMPTY partition spec in the final
    * (post-AQE) plan — the shape Spark itself warns about ("No Partition
    * Defined ... serious performance degradation"): every row moves to one
    * task, so over a data-scaled input it is the single-node bottleneck at
    * 100 TB. Bounded frames that genuinely need a total order (the
    * `q_hybrid_rrf` ≤100-row rank arms) key on a LITERAL partition instead,
    * so the engine-wide invariant is zero, structurally. Same adaptive
    * traversal as [[PlanBudgets.shuffleCount]]. */
  private def unpartitionedWindows(plan: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _ =>
        (p match { case w: WindowExec if w.partitionSpec.isEmpty => 1
                   case _ => 0 }) +
          p.children.map(walk).sum + p.subqueries.map(walk).sum
    }
    walk(plan)
  }

  test("no declared query plans a cartesian product; BNLJ only for 1-row probes") {
    val offenders = plans.flatMap { case (name, plan, _, _) =>
      val cartesian = plan.contains("CartesianProduct")
      val badBnlj = plan.contains("BroadcastNestedLoopJoin") &&
        !oneRowProbeBnlj.contains(name)
      if (cartesian) Some(s"$name: CartesianProduct")
      else if (badBnlj) Some(s"$name: unexpected BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, s"all-pairs plans found:\n${offenders.mkString("\n")}")
  }

  test("every declared query keeps at least one whole-stage-codegen span") {
    // post-AQE plan strings print codegen spans as "*(n) Op" stars
    val offenders = plans.collect {
      case (name, plan, _, _)
          if !plan.contains("WholeStageCodegen") && !plan.contains("*(") =>
        name
    }
    assert(offenders.isEmpty,
      s"queries with zero codegen spans (fully interpreted plans):\n${offenders.mkString("\n")}")
  }

  test("per-query shuffle count stays within the recorded budget") {
    // the plan-REGRESSION gate ([[PlanBudgets]]): a refactor that adds an
    // Exchange to any declared query must either revert or consciously
    // regenerate the budget file — silent extra shuffles are the one plan
    // regression the structural audits above cannot see
    val budgets = PlanBudgets.load()
    assert(budgets.nonEmpty,
      s"missing ${PlanBudgets.resource} — run `sbt 'Test/runMain graft.PlanBudgets'`")
    val missing = plans.map(_._1).filterNot(budgets.contains)
    assert(missing.isEmpty,
      s"queries without a recorded shuffle budget (regenerate via " +
        s"`sbt 'Test/runMain graft.PlanBudgets'` and review the tsv diff): " +
        missing.mkString(", "))
    val over = plans.flatMap { case (name, _, c, _) =>
      if (c > budgets(name))
        Some(s"$name: $c shuffles > recorded ${budgets(name)}")
      else None
    }
    assert(over.isEmpty,
      s"shuffle-count regressions (revert, or regenerate the budgets and " +
        s"justify the increase):\n${over.mkString("\n")}")
  }

  test("no declared query plans a Scala UDF") {
    // the "Functions, not UDFs" rule as a structural invariant: every probe
    // that once wanted a UDF has a native Expression (BloomProbe, DotMicro,
    // ...) — a ScalaUDF in any executed plan is a regression
    val offenders = plans.collect {
      case (name, plan, _, _) if plan.contains("UDF") => name
    }
    assert(offenders.isEmpty,
      s"queries executing Scala UDFs:\n${offenders.mkString("\n")}")
  }

  test("no declared query plans an unpartitioned WindowExec") {
    // the single-task window shape Spark itself warns about: over a
    // data-scaled input it is the 100-TB bottleneck; bounded total-order
    // frames key on a literal partition instead (q_hybrid_rrf), so the
    // engine-wide count is structurally zero
    val offenders = plans.collect {
      case (name, _, _, w) if w > 0 => s"$name: $w unpartitioned WindowExec"
    }
    assert(offenders.isEmpty,
      s"partition-less windows found:\n${offenders.mkString("\n")}")
  }
}
