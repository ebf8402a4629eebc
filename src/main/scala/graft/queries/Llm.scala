package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expr.GraftFunctions

/** LLM-data-pipeline block (SURVEY.md §2.9, the north star): deduplication
  * (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup),
  * similarity search (brute-force + LSH-bucketed ANN), and text analysis
  * (token counting, quality scoring, language-ID heuristic, fingerprinting).
  *
  * Everything is built-in Catalyst expressions — higher-order array functions
  * for the vector math, `md5` for cross-engine-identical hashing (both Spark
  * and DuckDB emit the same hex string, which is what makes the MinHash and
  * SimHash pipelines oracle-checkable at all — seeded minwise hashing over
  * md5("<seed>:" || shingle) string minima instead of engine-specific hash()).
  *
  * Scale posture (100 TB):
  *  - every dedup is blocked (hash buckets / LSH bands / sign buckets) —
  *    no all-pairs joins anywhere; candidate pairs come from equi-joins on
  *    bucket keys, so they hash-partition and AQE handles band skew;
  *  - signatures are per-doc aggregations with map-side partials;
  *  - knn is one scan + TakeOrderedAndProject (no global sort); the LSH
  *    variant prunes the scan to candidate buckets first.
  */
object Llm {

  // ---- shared expression helpers -----------------------------------------

  /** Exploded bigram-shingle rows (doc_id, gram), duplicates included:
    * adjacent-token pairs via slice+arrays_zip, with the string concat AFTER
    * the explode so it runs codegen'd per row rather than inside an
    * interpreted per-element lambda (the transform() form cost ~0.5 ms/doc
    * at bench scale). A single-token doc zips against [null] and concat_ws
    * drops the null, yielding the bare token — the same fallback as the
    * oracle SQL's CASE len<2 branch. Callers that need set semantics
    * (Jaccard) dropDuplicates; minwise minima are multiset-invariant. */
  private def shingleRows(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val pairs = when(size(toks) >= 2,
        arrays_zip(slice(toks, lit(1), size(toks) - 1),
                   slice(toks, lit(2), size(toks) - 1)))
      .otherwise(arrays_zip(toks, array(lit(null).cast("string"))))
    docs.select(col("doc_id"), explode(pairs).as("pair"))
      .select(col("doc_id"),
        concat_ws(" ", col("pair").getField("0"), col("pair").getField("1")).as("gram"))
  }

  /** Exact float→double promotion of a vector column. */
  private def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-to-right double dot product — mirrors DuckDB's
    * list_sum over the zipped products (identical IEEE ops both engines). */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def l2(v: Column): Column = sqrt(dot(v, v))

  /** Reference higher-order-function cosine over float vectors — the
    * formulation the oracled queries started with; kept as the bit-exact
    * baseline LlmSpec checks the native Expression against. */
  private[graft] def cosineHof(a: Column, b: Column): Column =
    dot(asDouble(a), asDouble(b)) / (l2(asDouble(a)) * l2(asDouble(b)))

  /** Native codegen cosine ([[graft.expr.CosineSimilarity]]): bit-identical
    * to [[cosineHof]], ~100× cheaper per pair (tight primitive loop inside
    * whole-stage codegen instead of interpreted per-element lambdas). */
  private def cosine(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** 4-bit sign bucket over fixed coordinates — axis-aligned random-hyperplane
    * LSH for cosine (sign of dot with basis vectors e1,e17,e33,e49). At
    * production scale you would OR several such band tables to buy recall;
    * one band keeps the declared query deterministic and cheap. */
  private def signBucket(v: Column): Column =
    Seq(1, 17, 33, 49).zipWithIndex.map { case (p, i) =>
      when(element_at(v, p) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  // ---- deduplication ------------------------------------------------------

  /** §2.9 Exact dedup: group by content hash, keep the smallest doc_id —
    * the canonical "hash-groupBy" dedup; bucketed by md5 so it scales. */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("text_md5")

  /** §2.9 MinHash + LSH near-dup candidates: distinct bigram shingles →
    * 8 minwise hashes (8-hex-char windows of two seeded md5s — one strong
    * hash split into independent ranges, cross-engine identical) → 4 bands
    * of 2 → band-bucket equi-join → candidate pairs. No all-pairs
    * comparison at any point. */
  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    minhashPairs(Tables.documents(spark, dir))

  /** MinHash-LSH core over any (doc_id, text) frame — reused by the declared
    * query and property-tested on synthetic corpora in LlmSpec. The two md5s
    * are computed once per shingle in a projection BEFORE the aggregation
    * (2 hashes/row, not 8 — the signature stage dominates minhash cost at
    * bench scale). */
  def minhashPairs(docs: DataFrame): DataFrame = {
    val sh = shingleRows(docs)
      .select(col("doc_id"),
        md5(concat(lit("a:"), col("gram"))).as("m1"),
        md5(concat(lit("b:"), col("gram"))).as("m2"))
    val sig = sh.groupBy("doc_id").agg(
      min(substring(col("m1"), 1, 8)).as("h1"),
      min(substring(col("m1"), 9, 8)).as("h2"),
      min(substring(col("m1"), 17, 8)).as("h3"),
      min(substring(col("m1"), 25, 8)).as("h4"),
      min(substring(col("m2"), 1, 8)).as("h5"),
      min(substring(col("m2"), 9, 8)).as("h6"),
      min(substring(col("m2"), 17, 8)).as("h7"),
      min(substring(col("m2"), 25, 8)).as("h8"))
    def band(n: Int, c1: String, c2: String) =
      sig.select(col("doc_id"), lit(n).as("band"),
                 md5(concat(col(c1), col(c2))).as("bkey"))
    val bands = band(1, "h1", "h2")
      .unionByName(band(2, "h3", "h4"))
      .unionByName(band(3, "h5", "h6"))
      .unionByName(band(4, "h7", "h8"))
    val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("bkey"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band").as("band_b"),
                         col("bkey").as("bkey_b"))
    a.join(b, col("band") === col("band_b") && col("bkey") === col("bkey_b") &&
              col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** §2.9 SimHash near-dup: 16-bit fingerprint from md5 hex-digit parity
    * (per bit position: majority vote of ±1 over the doc's tokens), pairs
    * blocked on the fingerprint's top byte, kept at Hamming distance ≤ 3.
    * Hex-digit parity is a pure string test, so both engines derive
    * identical bits from identical md5 strings. */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.documents(spark, dir))

  /** SimHash core over any (doc_id, text) frame — reused by the declared
    * query and property-tested in LlmSpec. */
  def simhashPairs(docs: DataFrame): DataFrame = {
    val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .withColumn("m", md5(col("t")))
    val sums = (0 until 16).map { j =>
      sum(when(substring(col("m"), j + 1, 1).isin(oddHex: _*), 1).otherwise(-1))
        .as(s"s$j")
    }
    val fp = tok.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(j => when(col(s"s$j") > 0, lit(1 << j)).otherwise(lit(0)))
          .reduce(_ + _).as("simhash"))
    val a = fp.select(col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = fp.select(col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, expr("(sh_a div 256) = (sh_b div 256)") && col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** §2.9 n-gram Jaccard near-dup vs a probe document: distinct bigram sets,
    * |∩| / |∪| against doc 0.
    *
    * Shape: explode the distinct grams once and count intersections with a
    * broadcast hash semi-join on the gram string — every operator codegen'd.
    * (A first version computed `array_intersect(grams, probe)` per row; the
    * interpreted higher-order array ops cost ~1 ms/doc — 8× slower at bench
    * scale and the wrong constant for 100 TB. Set intersection as a join is
    * the scalable idiom.) */
  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val g = shingleRows(Tables.documents(spark, dir))
      .dropDuplicates("doc_id", "gram")
    val counts = g.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val probeGrams = g.filter(col("doc_id") === 0).select(col("gram").as("pgram"))
    val probeSize = probeGrams.agg(count(lit(1)).as("pg_size"))
    val inter = g.join(broadcast(probeGrams), col("gram") === col("pgram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_inter_raw"))
    counts
      .join(inter, Seq("doc_id"), "left")
      .crossJoin(broadcast(probeSize))
      .withColumn("n_inter", coalesce(col("n_inter_raw"), lit(0L)))
      .withColumn("jacc", round(
        col("n_inter").cast("double") /
          (col("n_grams") + col("pg_size") - col("n_inter")), 4))
      .select("doc_id", "n_grams", "n_inter", "jacc")
      .orderBy("doc_id")
  }

  /** §2.9 Embedding-cosine near-dup pairs: blocked by (label, 4-bit sign
    * bucket) — an equi-join, never all-pairs — then exact rounded cosine
    * ≥ 0.3 within each block. Norms are precomputed per vector (one scan),
    * so the pair stage pays one dot product per candidate. */
  def qDedupCosine(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("bkt", signBucket(col("embedding")))
    val a = e.select(col("vec_id").as("id_a"), col("label"),
                     col("embedding").as("va"), col("bkt"))
    val b = e.select(col("vec_id").as("id_b"), col("label").as("label_b"),
                     col("embedding").as("vb"), col("bkt").as("bkt_b"))
    a.join(b, col("label") === col("label_b") && col("bkt") === col("bkt_b") &&
              col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(cosine(col("va"), col("vb")), 4))
      .filter(col("cos_sim") >= 0.3)
      .select("label", "id_a", "id_b", "cos_sim")
      .orderBy("label", "id_a", "id_b")
  }

  // ---- similarity search --------------------------------------------------

  /** §2.9 Brute-force top-k cosine similarity vs a probe vector (vec_id 0):
    * one scan, rounded score, TakeOrderedAndProject — the exact baseline the
    * ANN variant is tested against. */
  def qKnnCosine(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("pv"))
    e.crossJoin(broadcast(probe))
      .withColumn("cos_sim", round(cosine(col("embedding"), col("pv")), 4))
      .select("vec_id", "label", "cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(10)
  }

  /** §2.9 LSH-bucketed ANN (no-oracle; recall asserted vs [[qKnnCosine]] in
    * LlmSpec): coarse stage prunes to vectors whose 4-bit sign bucket is
    * within Hamming distance 1 of the probe's bucket (multi-probe), fine
    * stage re-ranks the survivors by exact cosine. At 100 TB the coarse
    * stage is a partition-pruning-friendly filter on a precomputed bucket
    * column; here it is derived inline. */
  def qKnnCosineLsh(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("bkt", signBucket(col("embedding")))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("pv"), col("bkt").as("pbkt"))
    e.join(broadcast(probe), expr("bit_count(bkt ^ pbkt) <= 1"))
      .withColumn("cos_sim", round(cosine(col("embedding"), col("pv")), 4))
      .select("vec_id", "label", "cos_sim")
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(10)
  }

  // ---- text analysis ------------------------------------------------------

  /** §2.9 Token frequencies per language — explode + hash aggregation (the
    * wordcount shape; partial aggregation keeps the shuffle at |vocab| per
    * partition). */
  def qTextStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("n"))
      .orderBy("lang", "token")

  /** §2.9 Token counting: whitespace tokens, alphabetic tokens via regex,
    * and a BPE-ish chars/4 approximation. */
  def qTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        expr("size(regexp_extract_all(text, '[a-z]+', 0))").as("n_alpha_tokens"),
        length(col("text")).as("n_chars_actual"),
        ceil(length(col("text")) / lit(4.0)).cast("bigint").as("approx_bpe_tokens"))
      .orderBy("doc_id")

  /** §2.9 Quality scoring: chars-per-token, stopword ratio, type-token
    * ratio — the standard cheap text-quality filters. */
  def qTextQuality(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val stops = filter(toks, t => t.isin("a", "the"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        length(col("text")).as("n_chars_m"),
        round(length(col("text")).cast("double") / size(toks), 4).as("chars_per_token"),
        size(stops).as("n_stop"),
        round(size(stops).cast("double") / size(toks), 4).as("stop_ratio"),
        round(size(array_distinct(toks)).cast("double") / size(toks), 4).as("ttr"))
      .orderBy("doc_id")
  }

  /** §2.9 Language-ID heuristic: marker-token votes per candidate class,
    * argmax with a fixed precedence tie-break. (On real corpora the marker
    * sets are per-language stopword lists; the mechanics — count marker
    * hits per class, argmax — are identical.) */
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    def score(markers: String*): Column =
      size(filter(toks, t => t.isin(markers: _*)))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        score("join", "filter", "order", "table").as("s_sql"),
        score("hash", "scan", "merge", "sort").as("s_exec"),
        score("vector", "window", "batch", "line").as("s_vec"))
      .withColumn("lang_guess",
        when(col("s_sql") >= col("s_exec") && col("s_sql") >= col("s_vec"), "sql")
          .when(col("s_exec") >= col("s_vec"), "exec")
          .otherwise("vec"))
      .orderBy("doc_id")
  }

  /** §2.9 Document fingerprinting: exact content hash, bag-of-words shape
    * hash (sorted distinct tokens), and a polynomial rolling hash folded
    * left-to-right over per-token codes mod 1e9+7 (bounds keep every
    * intermediate < 2^63, so ANSI overflow checking never trips). */
  def qDocFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val codes = transform(toks, t => (ascii(t) * 31 + length(t)).cast("bigint"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(col("text")).as("exact_fp"),
        md5(concat_ws(" ", sort_array(array_distinct(toks)))).as("shape_fp"),
        aggregate(codes, lit(0L), (acc, x) => (acc * 131 + x) % 1000000007L)
          .as("rolling_fp"))
      .orderBy("doc_id")
  }
}
