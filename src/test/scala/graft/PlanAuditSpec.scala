package graft

import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide physical-plan invariants over EVERY declared query
  * (SURVEY.md §4): the 100-TB contract is that no query may plan an
  * all-pairs join. `CartesianProduct` is banned outright;
  * `BroadcastNestedLoopJoin` is allowed only where the build side is a
  * broadcast single-row probe (the knn/jaccard probe pattern), never as a
  * fallback for a missed equi-join. */
class PlanAuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Queries whose plan legitimately contains a 1-row broadcast nested
    * loop: a scalar probe (vector or gram-set size) joined to every row. */
  private val oneRowProbeBnlj = Set(
    "q_knn_cosine", "q_knn_cosine_lsh", "q_knn_cosine_ivf", "q_ngram_jaccard")

  test("no declared query plans a cartesian product; BNLJ only for 1-row probes") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, TestSpark.sfDir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val badBnlj = plan.contains("BroadcastNestedLoopJoin") &&
        !oneRowProbeBnlj.contains(name)
      if (cartesian) Some(s"$name: CartesianProduct")
      else if (badBnlj) Some(s"$name: unexpected BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, s"all-pairs plans found:\n${offenders.mkString("\n")}")
  }
}
