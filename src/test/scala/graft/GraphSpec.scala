package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Graph, Llm}

/** Graph-analytics contracts (SURVEY.md §2.9 graph block): the triangle
  * enumeration must be exact (parity vs the naive orientation-independent
  * closure) and the degree-ordered orientation must actually bound hub
  * fan-out (the star-graph property the formulation exists for). PageRank's
  * cross-engine story is integer arithmetic, covered by the DuckDB oracle
  * and DeterminismSpec. */
class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def edges(rows: (Long, Long)*) = rows.toDF("doc_a", "doc_b")

  test("triangles: planted graph counts each corner exactly once") {
    // Two triangles sharing node 3, plus a 10-leaf star at hub 100 whose
    // leaves never pair with each other — the star closes nothing.
    val star = (20L to 29L).map(l => (math.min(100L, l), math.max(100L, l)))
    val e = edges(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L))
      ++ star: _*)
    val got = Graph.trianglesOver(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L),
      "hub and leaves must be absent; shared corner counts both triangles")
  }

  test("triangles: degree-ordered enumeration matches the naive closure on the real pair graph") {
    // Independent orientation-free restatement (the a<b<c closure the
    // DuckDB oracle also runs) over the actual MinHash candidate graph.
    val pairs = Llm.minhashPairs(Tables.documents(spark, TestSpark.sfDir))
    val e1 = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
    val e2 = pairs.select(col("doc_a").as("b2"), col("doc_b").as("c"))
    val e3 = pairs.select(col("doc_a").as("a3"), col("doc_b").as("c3"))
    val tri = e1.join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c") === col("c3"))
    val naive = tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Graph.qTriangles(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naive, "degree-ordered enumeration lost or invented a triangle")
    assert(got.nonEmpty, "sf0.001 near-dup graph should contain triangles")
  }

  test("pagerank: an empty edge set yields an empty rank frame, not a driver ArithmeticException (r15 ADVICE)") {
    // the driver-side n_nodes literal fold must guard n == 0 — plant an
    // empty lineitem table (schema only) and run the real query against it
    val dir = java.nio.file.Files.createTempDirectory("graft_pr_empty").toString
    spark.emptyDataset[(Long, Long)].toDF("l_suppkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = Graph.qPagerank(spark, dir)
    assert(out.columns.toSeq === Seq("node", "rank_nano"),
      "the empty result keeps the declared schema")
    assert(out.collect().isEmpty)
  }

  test("triangles: orientation caps hub fan-out (star hub emits no wedges)") {
    // Under id-ordering a hub with id 0 would mint C(10,2)=45 wedges; under
    // degree-ordering every leaf (deg 1) points AT the hub (deg 10), the
    // hub has out-degree 0, and the wedge join produces zero rows. Verified
    // through the public result: no pair of leaves can close (no edge), so
    // any nonzero output would mean wedges formed and closed incorrectly.
    val star = edges((1L to 10L).map(l => (0L, l)): _*)
    assert(Graph.trianglesOver(star).collect().isEmpty)
  }
}
