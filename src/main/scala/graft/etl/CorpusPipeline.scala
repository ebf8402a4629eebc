package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.{Llm, LlmText}

/** End-to-end corpus curation — the standard LLM training-data funnel
  * composed from the engine's declared operators, in the order a production
  * pass runs them (cheap map-side gates first, joins and near-dup last, so
  * every expensive stage sees an already-shrunk corpus):
  *
  *   0 input                  the raw documents table
  *   1 holdout_excluded       the held-out eval source (src0) leaves the
  *                            training corpus entirely
  *   2 quality_gate           logistic quality score ≥ 0.5 (q_quality_score)
  *   3 repetition_filter      Gopher-style repetition rules (q_repetition_filter)
  *   4 exact_dedup            one survivor per md5(text) (q_dedup_exact rule)
  *   5 near_dedup             MinHash-LSH candidates → connected components →
  *                            min-doc_id survivor per component (q_dedup_keep
  *                            rule, run on the stage-4 survivors)
  *   6 decontaminate          drop docs sharing any word 4-gram with the
  *                            held-out source (q_decontaminate rule)
  *
  * Stage predicates REUSE the declared query bodies (joins against their
  * outputs / the same shared helpers), so the funnel cannot drift from the
  * operators it advertises; CorpusPipelineSpec asserts that stage-by-stage
  * equivalence in-engine, and the `q_corpus_curate` oracle re-states the
  * whole funnel independently in DuckDB SQL.
  *
  * Scale shape: stages 1–3 are pure map-side filters over the scan; stage 4
  * is one content-hash aggregation; stage 5 runs banded LSH + iterative CC
  * on the already-filtered corpus; stage 6 is a gram equi-join against the
  * (small) holdout gram set. The declared report query recomputes the stage
  * frames per count for purity — a production run materializes each stage
  * boundary once (checkpoint / snapshot publish) instead. */
object CorpusPipeline {

  /** Exploded per-doc word 4-grams — delegates to the ONE shared gram
    * definition ([[Llm.gram4Rows]]) so the funnel's contamination stage can
    * never de-synchronize from `q_decontaminate`/`q_span_dup`. */
  private def grams4(df: DataFrame): DataFrame =
    Llm.gram4Rows(df).select("doc_id", "gram")

  /** The six stage frames, in funnel order, each a subset of its
    * predecessor. Head is the raw input. */
  def stages(spark: SparkSession, dir: String): Seq[(String, DataFrame)] = {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val d0 = Tables.documents(spark, dir)
    val d1 = d0.filter(col("source") =!= "src0")

    val kept = LlmText.qQualityScore(spark, dir)
      .filter(col("kept")).select("doc_id")
    val d2 = d1.join(kept, "doc_id")

    val calm = LlmText.qRepetitionFilter(spark, dir)
      .filter(!col("flagged")).select("doc_id")
    val d3 = d2.join(calm, "doc_id")

    val canonical = d3.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val d4 = d3.join(canonical, "doc_id")

    val Seq((_, d5), (_, d6)) =
      finishFromExactDeduped(d4, d0.filter(col("source") === "src0"))

    Seq("input" -> d0, "holdout_excluded" -> d1, "quality_gate" -> d2,
        "repetition_filter" -> d3, "exact_dedup" -> d4,
        "near_dedup" -> d5, "decontaminate" -> d6)
  }

  /** Resume the funnel from a MATERIALIZED stage-4 boundary (any frame with
    * `doc_id`/`text`) — the production shape: a long curation run persists
    * each stage (e.g. through [[Warehouse.publish]] snapshots) and the
    * expensive near-dedup + decontamination stages restart from the
    * snapshot rather than recomputing the gates. Returns the last two
    * stage frames; [[stages]] routes through this same code, and
    * CorpusPipelineSpec proves snapshot-resumed output equals the pure
    * in-memory funnel. */
  def finishFromExactDeduped(d4: DataFrame, holdout: DataFrame): Seq[(String, DataFrame)] = {
    graft.expr.GraftFunctions.ensureRegistered(d4.sparkSession)
    val nonCanonical = Llm.dedupGroups(Llm.minhashCcEdges(d4))
      .filter(col("doc_id") =!= col("group_id"))
      .select("doc_id")
    val d5 = d4.join(nonCanonical, Seq("doc_id"), "left_anti")

    val evalGrams = grams4(holdout).select("gram").distinct()
    val contaminated = grams4(d5)
      .join(evalGrams, Seq("gram"), "left_semi")
      .select("doc_id").distinct()
    val d6 = d5.join(contaminated, Seq("doc_id"), "left_anti")
    Seq("near_dedup" -> d5, "decontaminate" -> d6)
  }

  /** The curated training corpus (the last stage frame). */
  def curate(spark: SparkSession, dir: String): DataFrame =
    stages(spark, dir).last._2

  /** §2.9 Declared funnel report: docs remaining after each stage — the
    * curation run's audit artifact (every real pipeline logs exactly this
    * table; a stage suddenly dropping 90% is how regressions surface).
    *
    * Counted via per-doc survival FLAGS in one labeled frame rather than a
    * union of per-stage count branches: a union recomputes every expensive
    * stage prefix once per branch, while the flag frame computes each stage
    * set exactly once and reduces to a single aggregation — also the shape
    * a 100 TB funnel audit wants (one pass over the corpus with six boolean
    * sums, not seven jobs).
    *
    * The stage-1..3 gates are pure per-row predicates, so they compute as
    * ONE fused scan projection via the shared gate columns ([[LlmText.qualityZ]],
    * [[LlmText.withRepetitionMetrics]] — the same definitions the declared
    * queries evaluate) and the gated frame is PINNED (stage-boundary
    * materialization — reliable checkpoint when a checkpoint dir is set,
    * executor-local otherwise, the same discipline as the CC loop). Both
    * matter, measured at sf0.1/local[32]: joining the declared queries'
    * outputs on doc_id re-evaluated that join lineage in the CC-edge job
    * and again under the final aggregate — 10.8 s; fusing the gates
    * map-side WITHOUT pinning made it 18.3 s, because the higher-order-
    * function gate expressions (interpreted, outside codegen CSE)
    * re-evaluated in every consumer branch — the join shuffles had been
    * accidental materialization barriers; fusing AND pinning computes the
    * text featurization exactly once — ~4.3 s (the residual is near-dedup:
    * MinHash + iterative CC on the s4 survivors).
    *
    * What gets pinned is the r8 refinement: flags + the 16-byte content
    * hash, NOT the text payload. The r7 shape checkpointed the full `text`
    * column, which made the eager materialization corpus-sized — benign on
    * an idle machine but the one part of the plan whose cost scales with
    * storage/disk pressure from the rest of a long-running session (the r7
    * driver round recorded 11.3 s for a plan that reproduces at 4.3 s
    * in-suite on an idle machine; repeated same-code runs here swing
    * 4.3→5.9 s with background load, so the driver number is environment,
    * not plan — PLANS.md "q_corpus_curate reconciliation"). The narrow
    * frame caps that exposure and is the 100 TB discipline anyway: persist
    * small stage boundaries, re-scan the immutable corpus for the one
    * payload stage (MinHash shingling) via a pruned (doc_id, text)
    * columnar read + semi-join.
    * CorpusPipelineSpec asserts this formulation equals [[stages]]' frame
    * counts in-engine; the DuckDB oracle restates the funnel a third way. */
  def qCorpusCurate(spark: SparkSession, dir: String): DataFrame = {
    def n(c: Column) = sum(c.cast("long"))
    survivalFlags(spark, dir)
      .agg(n(lit(true)).as("n0"), n(col("s1")).as("n1"), n(col("s2")).as("n2"),
           n(col("s3")).as("n3"), n(col("s4")).as("n4"), n(col("s5")).as("n5"),
           n(col("s6")).as("n6"))
      .select(expr(
        """stack(7,
          |  0, 'input', n0, 1, 'holdout_excluded', n1, 2, 'quality_gate', n2,
          |  3, 'repetition_filter', n3, 4, 'exact_dedup', n4,
          |  5, 'near_dedup', n5, 6, 'decontaminate', n6)
          |  AS (stage_idx, stage, n_docs)""".stripMargin))
      .withColumn("stage_idx", col("stage_idx").cast("int"))
      .orderBy("stage_idx")
  }

  /** Per-doc survival FLAGS through the funnel `(doc_id, s1..s6)` — the
    * shared core of [[qCorpusCurate]] (which aggregates it to stage counts)
    * and [[qCurationAudit]] (which emits it as the per-doc decision log).
    * One frame, computed once, with the pin/fusion discipline documented
    * on the report query. */
  private def survivalFlags(spark: SparkSession, dir: String): DataFrame = {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val d0 = Tables.documents(spark, dir)
    val gated = LlmText.withRepetitionMetrics(
        d0.select(col("doc_id"), col("source"), col("text"))
          .withColumn("words", split(col("text"), " ")))
      .withColumn("s1", col("source") =!= "src0")
      .withColumn("s2", col("s1") && LlmText.qualityZ(col("text"), col("words")) >= 0)
      .withColumn("s3", col("s2") && col("n_words") >= 2 && !col("flagged"))
      .withColumn("h", md5(col("text")))
      .select("doc_id", "h", "s1", "s2", "s3")
    val f3 =
      if (spark.sparkContext.getCheckpointDir.isDefined) gated.checkpoint()
      else gated.localCheckpoint(true)
    // The pinned frame is flags + a 16-byte content hash — NOT the corpus:
    // the exact-dedup stage groups on the pinned `h` directly (no text
    // re-read), and the one stage that genuinely needs the payload
    // (MinHash shingling) re-reads it from the immutable columnar corpus
    // and semi-joins the surviving ids. Pinning the full `text` column was
    // the r7 shape; a narrow flag frame makes the eager materialization
    // metadata-sized and insensitive to storage-memory/disk pressure from
    // the rest of a long-running session. This is also the 100 TB
    // discipline: persist SMALL stage boundaries (id + hash + flags),
    // re-scan the immutable corpus for payload stages, never park the
    // corpus itself in executor storage.
    val canonical = f3.filter(col("s3"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(true).as("cok"))
    val f4 = f3.join(canonical, Seq("doc_id"), "left")
      .withColumn("s4", col("s3") && coalesce(col("cok"), lit(false)))
    val ccDrop = Llm.dedupGroups(
        Llm.minhashCcEdges(d0.select("doc_id", "text").join(
          f4.filter(col("s4")).select("doc_id"), "doc_id")))
      .filter(col("doc_id") =!= col("group_id"))
      .select(col("doc_id"), lit(true).as("ccd"))
    val f5 = f4.join(ccDrop, Seq("doc_id"), "left")
      .withColumn("s5", col("s4") && !coalesce(col("ccd"), lit(false)))
    // contamination is per-doc INDEPENDENT of the earlier gates, so the
    // flag computes corpus-wide from the raw input — s6 = s5 ∧ ¬con is the
    // same set either way, and this branch carries no dependency on the
    // f5 chain (which the gram pass would otherwise re-evaluate)
    val evalGrams = grams4(d0.filter(col("source") === "src0"))
      .select("gram").distinct()
    // gram only the non-holdout side (r19): src0 docs' membership in
    // `contaminated` was always irrelevant (s6 = s5 ∧ ¬con and s5 ⊆ s1
    // excludes src0), so gramming the full corpus re-exploded the holdout
    // fifth of it for rows the flag join never used. Both gram passes'
    // source filters push down to the scan, so together they read each doc
    // once. Same s6 set (CorpusPipelineSpec + both oracles gate it).
    val contaminated = grams4(d0.filter(col("source") =!= "src0"))
      .join(evalGrams, Seq("gram"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("con", lit(true))
    val f6 = f5.join(contaminated, Seq("doc_id"), "left")
      .withColumn("s6", col("s5") && !coalesce(col("con"), lit(false)))
    f6.select("doc_id", "s1", "s2", "s3", "s4", "s5", "s6")
  }

  /** §2.9 EXPLAINABLE curation audit (r14) — the per-doc decision log the
    * funnel report aggregates away: for every input document, its survival
    * flag through each gate and the FIRST stage that dropped it. This is
    * the table a data engineer actually debugs with ("why did doc 4711
    * fall out?") and the provenance record a compliance review asks for —
    * the funnel report says a stage dropped 12%, this says WHICH docs and
    * names the gate. Same one-pass flag frame as the report (computed
    * once, shared core), so the audit costs what the report costs plus a
    * doc-count-sized projection — never a second funnel run. Oracled: the
    * DuckDB SQL restates the entire funnel per-doc via stage-membership
    * left joins over the same CTE chain as `q_corpus_curate`. */
  def qCurationAudit(spark: SparkSession, dir: String): DataFrame =
    survivalFlags(spark, dir)
      .select(col("doc_id"),
        col("s1").as("s1_holdout"), col("s2").as("s2_quality"),
        col("s3").as("s3_repetition"), col("s4").as("s4_exact"),
        col("s5").as("s5_neardup"), col("s6").as("s6_decontam"),
        col("s6").as("kept"),
        when(!col("s1"), "holdout_excluded")
          .when(!col("s2"), "quality_gate")
          .when(!col("s3"), "repetition_filter")
          .when(!col("s4"), "exact_dedup")
          .when(!col("s5"), "near_dedup")
          .when(!col("s6"), "decontaminate")
          .otherwise("kept").as("drop_stage"))
      .orderBy("doc_id")
}
