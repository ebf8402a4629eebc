package graft.expr

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Typed `Aggregator` keeping the k largest longs per group in a single
  * aggregation pass (SURVEY.md §2.11 "custom agg").
  *
  * Scale rationale: the window formulation of per-group top-k
  * (`row_number() over (partition by g order by v desc) <= k`) must shuffle
  * and SORT every row of every group; this aggregator's buffer is bounded at
  * k values, participates in map-side partial aggregation, and merges in
  * O(k) — at 100 TB the shuffle carries k longs per group instead of the
  * group's full row set. The classic partial-top-k pattern.
  *
  * The buffer is a descending-sorted Array[Long] of size ≤ k, so reduce is
  * an insertion into a tiny array and merge is a bounded merge-sort step —
  * no heap allocation churn, and the ExpressionEncoder keeps the buffer in
  * Tungsten rows (no kryo blobs).
  */
final class TopKLongsAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    if (buf.length < k) {
      val out = new Array[Long](buf.length + 1)
      insertDesc(buf, buf.length, v, out); out
    } else if (v <= buf(k - 1)) buf
    else {
      val out = new Array[Long](k)
      insertDesc(buf, k - 1, v, out); out
    }

  /** Copy the first `n` values of `src` (sorted desc) plus `v` into `out`,
    * keeping descending order. */
  private def insertDesc(src: Array[Long], n: Int, v: Long, out: Array[Long]): Unit = {
    var i = 0
    while (i < n && src(i) >= v) { out(i) = src(i); i += 1 }
    out(i) = v
    while (i < n) { out(i + 1) = src(i); i += 1 }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      if (j >= b.length || (i < a.length && a(i) >= b(j))) { out(o) = a(i); i += 1 }
      else { out(o) = b(j); j += 1 }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
