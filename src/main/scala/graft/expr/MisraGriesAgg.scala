package graft.expr

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

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
  * Per-token cost: the immutable HAMT buffer pays O(log k) and a couple of
  * small allocations per reduce — dominated by the upstream split/explode;
  * if the sketch pass ever surfaces in profiles, a sorted primitive-array
  * buffer (the [[TopKLongsAgg]] layout, generalized to string keys) is the
  * next lever.
  */
final class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], w: String): Map[String, Long] =
    buf.get(w) match {
      case Some(c)                  => buf.updated(w, c + 1)
      case None if buf.size < k     => buf.updated(w, 1L)
      case None                     =>
        // decrement-all; zeros drop (amortized O(1): each decrement pays
        // back one earlier increment)
        buf.flatMap { case (x, c) => if (c > 1) Some(x -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from everything, keep positives
      val cut = summed.valuesIterator.toArray.sortBy(-_).apply(k)
      summed.flatMap { case (w, c) => if (c > cut) Some(w -> (c - cut)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
