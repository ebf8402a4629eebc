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

  /** Sennrich BPE TRAINING — learn the merges table itself from a word
    * frequency vocabulary, completing the tokenizer story ([[merges]] above
    * is a fixture standing in for exactly this output).
    *
    * Pinned training semantics (the classic learn loop): every word is a
    * character symbol sequence; each round counts all adjacent symbol pairs
    * weighted by word frequency, picks the max-count pair with a TOTAL
    * deterministic tie-break (count desc, then left asc, then right asc),
    * merges ALL its non-overlapping occurrences left-to-right in every word
    * (training merges all at once; inference above re-picks per occurrence
    * — both are the standard Sennrich formulation), records the rule, and
    * repeats. Stops early when no pair repeats (count < 2 learns nothing).
    *
    * Scale split (same FAISS-style separation as IVF/PQ/[[graft.etl.Pca]]):
    * the corpus-scaled work is the distributed word-frequency aggregation
    * plus a deterministic top-V cap (count desc, word asc) — the trainer
    * itself sees only the BOUNDED capped vocabulary, exactly how production
    * tokenizer training operates (a vocab cap, not the token stream). The
    * loop is O(rounds · Σ word lengths) driver-local math. */
  def train(vocab: Seq[(String, Long)], nMerges: Int)
      : IndexedSeq[(String, String, Long)] = {
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      val candidates = counts.filter(_._2 >= 2)
      if (candidates.isEmpty) done = true
      else {
        val ((l, r), c) = candidates.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        out += ((l, r, c))
        words = words.map { case (syms, wc) => (mergeAll(syms, l, r), wc) }
        m += 1
      }
    }
    out.toIndexedSeq
  }

  /** Merge every non-overlapping (l, r) adjacency left-to-right — the
    * training-side replace-all step. */
  private[functions] def mergeAll(syms: Array[String], l: String, r: String)
      : Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }
}
