package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Llm

/** Properties for the hash-based near-dup pipelines (SURVEY.md §2.9
  * `q_dedup_minhash` collision behavior — golden values are meaningless for
  * LSH, collision structure is the contract) and recall for the LSH ANN
  * variant vs the brute-force baseline. */
class LlmSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val base =
    "spark scan filter join hash merge sort window batch vector line data key value table part"

  test("minhash: identical docs collide; disjoint-vocabulary docs do not") {
    val other = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val pairs = Llm.minhashPairs(docs(1L -> base, 2L -> base, 3L -> other))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "identical docs must collide in every band")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "doc with disjoint shingles must not share any band bucket")
  }

  test("minhash: near-duplicate (one token edited) still collides in some band") {
    val edited = base.replace("part", "unit")
    val pairs = Llm.minhashPairs(docs(1L -> base, 2L -> edited))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      "docs sharing 13/17 bigrams should collide in >=1 of 4 bands")
  }

  test("minhash is deterministic across runs") {
    val d = docs(1L -> base, 2L -> base.replace("part", "unit"), 3L -> "a b c d e")
    val r1 = Llm.minhashPairs(d).collect().toSeq
    val r2 = Llm.minhashPairs(d).collect().toSeq
    assert(r1 === r2)
  }

  test("simhash: identical docs have hamming 0; pair survives the <=3 filter") {
    val rows = Llm.simhashPairs(docs(1L -> base, 2L -> base))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.toSeq === Seq((1L, 2L, 0)))
  }

  test("native cosine_similarity matches the HOF formulation bit-exactly, in codegen") {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    val e = Tables.embeddings(spark, TestSpark.sfDir)
      .select(org.apache.spark.sql.functions.col("vec_id"),
              org.apache.spark.sql.functions.col("embedding"))
    import org.apache.spark.sql.functions._
    val probe = e.filter(col("vec_id") === 0).select(col("embedding").as("pv"))
    val both = e.crossJoin(broadcast(probe))
      .withColumn("native", call_function("cosine_similarity", col("embedding"), col("pv")))
      .withColumn("hof", Llm.cosineHof(col("embedding"), col("pv")))
    // bit-exact: same float->double promotions, same sequential fold order
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    // codegen check on a native-only projection (the HOF baseline column is
    // CodegenFallback and would evict any shared projection from WSCG);
    // execute first — AQE shows the starred WSCG markers only in the final plan
    val nativeOnly = e.crossJoin(broadcast(probe))
      .select(call_function("cosine_similarity", col("embedding"), col("pv")).as("native"))
    nativeOnly.collect()
    val plan = nativeOnly.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project.*"),
      s"cosine_similarity projection fell out of whole-stage codegen:\n$plan")
    // SQL surface works too (registered via GraftExtensions / ensureRegistered)
    val viaSql = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").collect()(0).getDouble(0)
    assert(math.abs(viaSql - 1.0) < 1e-12)
  }

  test("near-dup pair stages are blocked equi-joins — never all-pairs") {
    // The 100 TB contract: candidate pairs must come from hash-partitionable
    // equi-joins on bucket keys, not nested-loop/cartesian expansion.
    Seq(
      Llm.qDedupMinhash(spark, TestSpark.sfDir),
      Llm.qDedupSimhash(spark, TestSpark.sfDir),
      Llm.qDedupCosine(spark, TestSpark.sfDir)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"all-pairs join in plan:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
    }
  }

  test("knn top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = Llm.qKnnCosine(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered in plan:\n$plan")
  }

  test("knn LSH: returns the probe first, overlaps brute force, sorted desc") {
    val exact = Llm.qKnnCosine(spark, TestSpark.sfDir).collect()
    val lsh = Llm.qKnnCosineLsh(spark, TestSpark.sfDir).collect()
    assert(exact.length === 10 && lsh.length === 10)
    // probe (vec_id 0) has cos 1.0 with itself and survives its own bucket
    assert(lsh.head.getLong(0) === 0L)
    val overlap = exact.map(_.getLong(0)).intersect(lsh.map(_.getLong(0)))
    assert(overlap.length >= 3, s"LSH recall too low: ${overlap.length}/10")
    val sims = lsh.map(_.getDouble(2)).toSeq
    assert(sims === sims.sorted(Ordering[Double].reverse), "not sorted by cos desc")
  }
}
