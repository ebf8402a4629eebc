package graft.expr

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra–Gries buffer: `n` live (word → residual) entries in paired arrays,
  * entries `[0, n)` sorted by word for O(log k) lookup. Arrays are fixed at
  * length k; reduce mutates in place (the aggregator holds the buffer as a
  * live object between updates — TypedImperativeAggregate — so mutation is
  * safe and allocation-free on the per-token hot path). */
final case class MgBuf(words: Array[String], counts: Array[Long], var n: Int)

/** Misra–Gries frequent-items sketch as a typed `Aggregator`
  * (SURVEY.md §2.11 "custom agg"; the candidate phase of the exact
  * heavy-hitters query §2.9 `q_heavy_hitters`).
  *
  * The buffer holds at most `k` (item → residual count) entries:
  *  - reduce: an incoming item already tracked gets +1; a new item joins a
  *    non-full buffer with count 1; on a full buffer every tracked count is
  *    decremented instead (dropping zeros) — the classic MG step;
  *  - merge: counts are summed, then if more than `k` items survive, the
  *    (k+1)-th largest residual is subtracted from everything and non-positive
  *    entries drop. This is the Agarwal et al. mergeable-summaries merge: the
  *    result of any reduce/merge tree over a partitioned stream keeps the MG
  *    error bound, which is what lets the sketch run as a map-side partial
  *    aggregation.
  *
  * Guarantee (property-tested in MisraGriesSpec): every item whose true
  * frequency exceeds n/(k+1) is present in the final buffer, and each
  * residual underestimates the true count by at most n/(k+1). So a
  * heavy-hitters query with support threshold s·n (s > 1/(k+1)) can use the
  * ≤ k sketch keys as a COMPLETE candidate set and re-count only those —
  * the shuffle carries k entries per map partition instead of the full
  * vocabulary, and the verify pass is a broadcast semi-join. That bounded
  * two-pass shape is the whole point at 100 TB: exact answers without ever
  * shuffling a vocabulary-sized aggregation.
  *
  * Buffer layout (r8): sorted paired arrays ([[MgBuf]]), mutated in place —
  * a hit costs one ≤ log₂k-compare binary search and one counter bump, zero
  * allocation; an insert memmoves ≤ k refs; the decrement-all step is one
  * in-place compacting walk (amortized O(1)/token — each decrement pays
  * back one earlier increment). Replaces the r7 immutable HAMT, whose
  * per-token node churn measured 0.52 s for the sf0.1 sketch pass against
  * 0.15 s for the identical scan+explode+count — the sketch, not the scan,
  * dominated (PLANS.md r8 note). Merge is a two-pointer sorted merge with
  * the (k+1)-th-largest cut applied on overflow.
  */
final class MisraGriesAgg(k: Int)
    extends Aggregator[String, MgBuf, Map[String, Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: MgBuf = MgBuf(new Array[String](k), new Array[Long](k), 0)

  /** Index of `w` in the sorted live prefix, or `-(insertion point) - 1`. */
  private def search(buf: MgBuf, w: String): Int = {
    var lo = 0; var hi = buf.n - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = buf.words(mid).compareTo(w)
      if (c < 0) lo = mid + 1
      else if (c > 0) hi = mid - 1
      else return mid
    }
    -(lo + 1)
  }

  override def reduce(buf: MgBuf, w: String): MgBuf = {
    val i = search(buf, w)
    if (i >= 0) buf.counts(i) += 1
    else if (buf.n < k) {
      val at = -i - 1
      System.arraycopy(buf.words, at, buf.words, at + 1, buf.n - at)
      System.arraycopy(buf.counts, at, buf.counts, at + 1, buf.n - at)
      buf.words(at) = w
      buf.counts(at) = 1L
      buf.n += 1
    } else {
      // decrement-all; zeros drop, in-place compaction preserves order
      var from = 0; var to = 0
      while (from < buf.n) {
        if (buf.counts(from) > 1) {
          buf.words(to) = buf.words(from)
          buf.counts(to) = buf.counts(from) - 1
          to += 1
        }
        from += 1
      }
      java.util.Arrays.fill(buf.words.asInstanceOf[Array[AnyRef]], to, buf.n, null)
      buf.n = to
    }
    buf
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    if (b.n == 0) return a
    if (a.n == 0) return b
    // two-pointer sorted merge into scratch of size ≤ a.n + b.n
    val m = a.n + b.n
    val ws = new Array[String](m)
    val cs = new Array[Long](m)
    var ia = 0; var ib = 0; var o = 0
    while (ia < a.n && ib < b.n) {
      val c = a.words(ia).compareTo(b.words(ib))
      if (c < 0) { ws(o) = a.words(ia); cs(o) = a.counts(ia); ia += 1 }
      else if (c > 0) { ws(o) = b.words(ib); cs(o) = b.counts(ib); ib += 1 }
      else { ws(o) = a.words(ia); cs(o) = a.counts(ia) + b.counts(ib); ia += 1; ib += 1 }
      o += 1
    }
    while (ia < a.n) { ws(o) = a.words(ia); cs(o) = a.counts(ia); ia += 1; o += 1 }
    while (ib < b.n) { ws(o) = b.words(ib); cs(o) = b.counts(ib); ib += 1; o += 1 }
    // overflow: subtract the (k+1)-th largest count, keep positives
    val cut =
      if (o <= k) 0L
      else {
        val sorted = java.util.Arrays.copyOfRange(cs, 0, o)
        java.util.Arrays.sort(sorted)
        sorted(o - 1 - k) // (k+1)-th largest
      }
    val out = zero
    var i = 0
    while (i < o) {
      if (cs(i) > cut) { out.words(out.n) = ws(i); out.counts(out.n) = cs(i) - cut; out.n += 1 }
      i += 1
    }
    out
  }

  override def finish(buf: MgBuf): Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    var i = 0
    while (i < buf.n) { b += buf.words(i) -> buf.counts(i); i += 1 }
    b.result()
  }

  override def bufferEncoder: Encoder[MgBuf] = ExpressionEncoder[MgBuf]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
