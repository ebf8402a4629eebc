package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Byte-pair-encoding tokenizer over a merges table — the real-vocabulary
  * upgrade of the whitespace/char-ratio token proxies (`q_token_count`):
  * token-budget enforcement (`q_source_budget`, `q_seq_pack`) at production
  * fidelity counts MODEL tokens, and model tokens come from a learned BPE
  * merge list, not from whitespace.
  *
  * Semantics (pinned, both engines): a word starts as its character symbol
  * sequence; repeatedly, among the merge rules whose pair is currently
  * adjacent, the LOWEST-RANK rule fires on its LEFTMOST occurrence, one
  * occurrence per step, until no rule applies. One-occurrence-at-a-time with
  * re-pick is the classic greedy BPE inference loop (rank order = training
  * order), and unlike a chained `replace`-all formulation it has no
  * boundary-sharing ambiguity on repeated pairs — which is what makes it
  * restatable EXACTLY as a DuckDB recursive CTE for the oracle.
  *
  * Scale shape: tokenization runs over the DISTINCT-WORD frame (vocabulary-
  * sized — never the token stream, never the corpus), with the merges table
  * broadcast; per-doc counts then come from one corpus-side hash agg joined
  * to the broadcast word→count map. A production 50k-merge vocabulary
  * changes the constants, not the shape: the per-word loop stays polynomial
  * in word length with a hash rank lookup, and the vocabulary frame stays
  * tiny relative to the corpus.
  *
  * The merge list itself is a FIXTURE (a small hand-built English-bigram
  * ladder that fully merges several corpus words — `table`, `window`,
  * `scan`, `fast` — and partially merges the rest), standing in for a
  * learned vocabulary; the operator is the delivery mechanism, the list is
  * data. */
object Bpe {

  /** Rank-ordered merges (rank = index). Well-formed: every operand is a
    * single character or the output of a strictly earlier merge. */
  val merges: IndexedSeq[(String, String)] = IndexedSeq(
    ("t", "h"), ("th", "e"), ("a", "n"), ("i", "n"), ("e", "r"), ("r", "e"),
    ("o", "r"), ("s", "t"), ("a", "r"), ("l", "e"), ("o", "w"), ("a", "t"),
    ("b", "le"), ("a", "ble"), ("t", "able"), ("s", "c"), ("sc", "an"),
    ("o", "u"), ("w", "in"), ("d", "ow"), ("win", "dow"), ("f", "a"),
    ("fa", "st"), ("d", "at"))

  private val rankOf: Map[(String, String), Int] =
    merges.zipWithIndex.map { case (p, i) => p -> i }.toMap

  /** Greedy BPE segmentation of one word against a rank map (lowest rank,
    * then leftmost, one occurrence per step). */
  def tokenize(word: String, rk: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i } // strict < keeps leftmost
        i += 1
      }
      if (bestIdx < 0) continue = false
      else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
        syms.drop(bestIdx + 2)
    }
    syms
  }

  def tokenize(word: String): Vector[String] = tokenize(word, rankOf)
  def tokenCount(word: String): Int = tokenize(word).length

  /** (word, n_bpe) for every distinct word in `words` (a single-column
    * frame) — the vocabulary-sized mapPartitions pass with the merges table
    * broadcast; callers broadcast-join the result back to corpus rows. */
  def tokenCounts(spark: SparkSession, words: DataFrame): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    words.as[String].mapPartitions { it =>
      val rk = bc.value.zipWithIndex.map { case (p, i) => p -> i }.toMap
      it.map(w => (w, tokenize(w, rk).length))
    }.toDF("w", "n_bpe")
  }
}
