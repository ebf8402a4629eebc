package graft.etl

/** Z-curve range decomposition — the READ side of the Morton layout
  * ([[graft.expr.Morton32]], `q_zorder_layout`): a 2-D grid box turns into a
  * small set of CONTIGUOUS z-value ranges, which a z-sorted table answers
  * with range scans (file/row-group min-max pruning) instead of a full
  * scan + residual filter. This is the quadtree form of the classic
  * BIGMIN/LITMAX technique: recursively split the grid cell; a subcell
  * fully inside the box contributes its whole z-interval (one range, by
  * the shared-prefix property PrimitiveProps pins), a disjoint subcell
  * contributes nothing, a straddling subcell recurses. Adjacent ranges are
  * coalesced, so an aligned box collapses to a handful of intervals.
  *
  * Driver-side bounded math: the decomposition depends only on the box and
  * the grid (never the data — O(perimeter) ranges for a 2^k grid), exactly
  * like partition-pruning predicate construction. */
object ZOrder {

  /** Inclusive z-ranges covering exactly the box [xLo..xHi] × [yLo..yHi]
    * on the 16-bit grid. */
  def ranges(xLo: Int, xHi: Int, yLo: Int, yHi: Int): Seq[(Long, Long)] = {
    require(0 <= xLo && xLo <= xHi && xHi <= 0xFFFF, s"bad x box [$xLo,$xHi]")
    require(0 <= yLo && yLo <= yHi && yHi <= 0xFFFF, s"bad y box [$yLo,$yHi]")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]

    // the shared single definition — probe correctness requires the
    // decomposition and the expression to agree bit-for-bit
    def morton(x: Int, y: Int): Long = graft.expr.Morton32.interleave(x, y)

    // cell = [cx, cx+size) × [cy, cy+size), size a power of two
    def cover(cx: Int, cy: Int, size: Int): Unit = {
      val cxHi = cx + size - 1
      val cyHi = cy + size - 1
      if (cxHi < xLo || cx > xHi || cyHi < yLo || cy > yHi) ()      // disjoint
      else if (cx >= xLo && cxHi <= xHi && cy >= yLo && cyHi <= yHi) {
        // fully inside: the cell's z-interval is contiguous (shared-prefix
        // property): [morton(cx,cy), morton(cx,cy) + size² - 1]
        val z0 = morton(cx, cy)
        out += ((z0, z0 + size.toLong * size - 1))
      } else {
        val h = size / 2
        // recurse in z order so emitted ranges arrive sorted
        cover(cx, cy, h); cover(cx + h, cy, h)
        cover(cx, cy + h, h); cover(cx + h, cy + h, h)
      }
    }

    cover(0, 0, 65536)
    // coalesce adjacent intervals (quadtree emits them in z order)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    out.foreach { case (lo, hi) =>
      if (merged.nonEmpty && merged.last._2 + 1 == lo)
        merged(merged.length - 1) = (merged.last._1, hi)
      else merged += ((lo, hi))
    }
    merged.toSeq
  }
}
