package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

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
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, ord, k, child) =>
      TopKPerGroupExec(g, ord, k, partial = false,
        TopKPerGroupExec(g, ord, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** One bounded-heap pass: per input partition, keep each group's k first
  * rows under `ordering` in a max-heap (head = worst kept row; a new row
  * replaces it only if it sorts earlier). O(n log k) per partition, memory
  * `groups-in-partition × k` rows. The partial pass runs map-side on
  * arbitrary partitioning; the final pass declares
  * [[ClusteredDistribution]] so every group's partials meet in one task. */
case class TopKPerGroupExec(groupCols: Seq[Attribute], ordering: Seq[SortOrder],
                            k: Int, partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

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
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(grp, attrs)
      val rowOrd = GenerateOrdering.generate(ord, attrs)
      // max-heap under the sort order: head is the kept row that sorts LAST
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
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
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
        .map { r => numOutputRows += 1; r }
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
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GraftStrategy))
      spark.experimental.extraStrategies =
        GraftStrategy +: spark.experimental.extraStrategies

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
