package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, AttributeSet, Descending, PredicateHelper, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.internal.SQLConf

/** Whole-operator extension path (SURVEY.md §2.11 option (c)): per-group
  * top-k as a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * registered through `SparkSessionExtensions` / `experimental
  * .extraStrategies`.
  *
  * Why a custom OPERATOR and not the window formulation: `row_number() OVER
  * (PARTITION BY g ORDER BY v) <= k` must shuffle EVERY row to its group's
  * partition and fully sort there — at 100 TB the shuffle carries the whole
  * table. This operator plans as two [[TopKPerGroupExec]] passes around one
  * exchange (the partial-aggregation pattern, applied to top-k): the map
  * side keeps a bounded k-row heap per group, so the shuffle carries at most
  * `k × groups-per-partition` rows, and the reduce side merges heaps — no
  * full sort anywhere. The [[graft.expr.TopKLongsAgg]] Aggregator gets the
  * same bound for a single long column; this node keeps WHOLE ROWS, which a
  * value-typed aggregation buffer cannot (the row stays in Tungsten format
  * end to end — no struct packing/unpacking).
  *
  * Semantics: the k first rows of each group under `ordering` (the window
  * `row_number() <= k` rows, as a set — output order within a group is
  * unspecified, like any unsorted relational result). Callers wanting
  * deterministic results make `ordering` total with a tiebreaker, exactly
  * as they would for the window form.
  */
case class TopKPerGroup(groupCols: Seq[Attribute], ordering: Seq[SortOrder],
                        k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans [[TopKPerGroup]] as partial→exchange→final [[TopKPerGroupExec]]:
  * the final pass requires clustering on the group keys, so
  * EnsureRequirements inserts exactly one hash exchange between the two —
  * carrying the partials' ≤ k rows per (group × map partition), not the
  * input. */
object GraftStrategy extends SparkStrategy {
  /** Map-side group-map size at which the partial pass flushes (emits its
    * heaps and resets) — bounds partial memory at `flush × k` rows per task
    * when group cardinality per partition is huge, trading shuffle volume
    * for memory exactly like hash aggregation's fallback. The final pass
    * never flushes (a group's rows must meet in one map). */
  val partialFlushKey = "spark.graft.topk.partialFlushGroups"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, ord, k, child) =>
      val flush = SQLConf.get.getConfString(partialFlushKey, "131072").toInt
      TopKPerGroupExec(g, ord, k, partial = false, Int.MaxValue,
        TopKPerGroupExec(g, ord, k, partial = true, flush, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Optimizer integration for the custom node (SURVEY.md §4): Catalyst
  * cannot move predicates through an operator it does not know, so an
  * unknown node is a pushdown BARRIER — a filter written after
  * [[TopK.perGroup]] would otherwise evaluate post-shuffle on the full
  * top-k output instead of pruning the scan. This injected rule teaches
  * the optimizer the one algebraic fact that makes the move sound: a
  * deterministic predicate over the GROUP columns commutes with per-group
  * top-k (it drops whole groups, never reorders rows within a kept group).
  * Once below the node, the ordinary pushdown batch carries it into the
  * scan ([[SQLConf]] fixed-point semantics — the rule runs inside the
  * operator-optimization batch). */
object TopKPushdownRule extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, t: TopKPerGroup) =>
      val (pushable, kept) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(AttributeSet(t.groupCols)))
      if (pushable.isEmpty) f
      else {
        val pushed = t.copy(child = Filter(pushable.reduce(And), t.child))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** One bounded-heap pass: per input partition, keep each group's k first
  * rows under `ordering` in a max-heap (head = worst kept row; a new row
  * replaces it only if it sorts earlier). O(n log k) per partition, memory
  * `groups-in-partition × k` rows. The partial pass runs map-side on
  * arbitrary partitioning; the final pass declares
  * [[ClusteredDistribution]] so every group's partials meet in one task. */
case class TopKPerGroupExec(groupCols: Seq[Attribute], ordering: Seq[SortOrder],
                            k: Int, partial: Boolean, flushGroups: Int,
                            child: SparkPlan)
  extends UnaryExecNode {
  require(partial || flushGroups == Int.MaxValue,
    "only the partial pass may flush — a final-pass group must meet in one map")

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupCols) :: Nil

  override lazy val metrics: Map[String, SQLMetric] =
    Map("numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val grp = groupCols
    val ord = ordering
    val attrs = child.output
    val kk = k
    val flush = flushGroups
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(grp, attrs)
      val rowOrd = GenerateOrdering.generate(ord, attrs)
      // max-heap under the sort order: head is the kept row that sorts LAST
      var heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(rowOrd)
          heaps.put(key.copy(), heap) // iterator reuses the projection buffer
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      def drain(): Iterator[InternalRow] = {
        import scala.jdk.CollectionConverters._
        val out = heaps
        heaps = new java.util.HashMap()
        out.values().iterator().asScala.flatMap(_.iterator)
      }
      // Streaming emit: rows flow out on each flush, not buffered to the
      // partition's end — memory stays ≤ flushGroups × k rows regardless
      // of per-partition group cardinality.
      new scala.collection.AbstractIterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!pending.hasNext && iter.hasNext) {
            insert(iter.next())
            if (heaps.size > flush) pending = drain()
          }
          if (!pending.hasNext && !heaps.isEmpty) pending = drain()
          pending.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty top-k iterator")
          numOutputRows += 1
          pending.next()
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Public face of the operator. */
object TopK {

  /** Idempotent strategy registration on any session — mirrors
    * [[graft.expr.GraftFunctions.ensureRegistered]]; also injected
    * session-wide via `spark.sql.extensions=graft.expr.GraftExtensions`. */
  def ensureRegistered(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(GraftStrategy))
      spark.experimental.extraStrategies =
        GraftStrategy +: spark.experimental.extraStrategies
    if (!spark.experimental.extraOptimizations.contains(TopKPushdownRule))
      spark.experimental.extraOptimizations =
        TopKPushdownRule +: spark.experimental.extraOptimizations
  }

  /** The k first rows of each group under `orderSpec` (`(column, ascending)`
    * pairs, applied in sequence — include a tiebreaker to make it total).
    * Equivalent to the window `row_number() <= k` filter, planned as
    * partial/final bounded heaps around one exchange. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderSpec: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      analyzed.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column '$n' not among ${analyzed.output.map(_.name).mkString(", ")}"))
    val ordering = orderSpec.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      TopKPerGroup(groupCols.map(attr), ordering, k, analyzed))
  }
}
