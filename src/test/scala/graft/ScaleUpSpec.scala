package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the 10× replica constructor the scale gate measures on —
  * the harness itself is part of the scale claim, so its invariants are
  * proven: exact row scaling, cross-copy key disjointness (joins stay
  * per-copy), and the two perturbation claims (text structure preserved
  * while shingles change; embedding norms and within-copy cosines
  * preserved while cross-copy similarity scrambles). Runs at sf0.001 ×3 —
  * the construction is factor- and SF-agnostic. */
class ScaleUpSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val out: String = {
    val dir = Files.createTempDirectory("graft_scaleup").toString
    ScaleUp.replicate(spark, TestSpark.sfDir, dir, copies = 3)
    dir
  }

  test("every table scales by exactly the copy count; copies are key-disjoint") {
    for (t <- Tables.names) {
      val src = spark.read.parquet(s"${TestSpark.sfDir}/$t.parquet")
      val rep = spark.read.parquet(s"$out/$t.parquet")
      assert(rep.count() === 3 * src.count(), s"$t row count")
    }
    val doc = spark.read.parquet(s"$out/documents.parquet")
    assert(doc.select("doc_id").distinct().count() === doc.count(),
      "shifted keys collide nowhere")
    // referential integrity holds WITHIN each copy: every lineitem order
    // key resolves (the shifts move fact and dimension keys in lockstep)
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val o = spark.read.parquet(s"$out/orders.parquet")
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .count() === 0L, "fact keys resolve after the shift")
  }

  test("text perturbation preserves length/whitespace but kills cross-copy identity") {
    val rep = spark.read.parquet(s"$out/documents.parquet")
    val src = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val n = src.count()
    // per-copy length distribution identical (translate is 1:1)
    val lenBySrc = src.select(sum(length(col("text")))).head.getLong(0)
    val lenByCopy = rep.withColumn("copy", (col("doc_id") / 100000000L).cast("int"))
      .groupBy("copy").agg(sum(length(col("text"))).as("s"))
      .orderBy("copy").collect().map(_.getLong(1)).toSeq
    assert(lenByCopy === Seq(lenBySrc, lenBySrc, lenBySrc))
    // cross-copy texts differ: no document's copy-1 text equals its copy-0
    // text (unless the text carries no ring characters at all)
    val joined = rep.filter(col("doc_id") < 100000000L).as("a")
      .join(rep.filter(col("doc_id") >= 100000000L && col("doc_id") < 200000000L).as("b"),
        col("a.doc_id") === col("b.doc_id") - 100000000L)
      .select(col("a.text").as("t0"), col("b.text").as("t1"))
    val same = joined.filter(col("t0") === col("t1"))
      .filter(col("t0").rlike("[aeioustnrlAEIOUSTNRL]")).count()
    assert(same === 0L, "ring rotation must change every ring-bearing text")
    assert(joined.filter(length(col("t0")) =!= length(col("t1"))).count() === 0L,
      "rotation is length-preserving")
    assert(n > 0)
  }

  test("embedding sign flips preserve norms exactly and scramble cross-copy cosine") {
    val rep = spark.read.parquet(s"$out/embeddings.parquet")
    val pairs = rep.filter(col("vec_id") < 100000000L).as("a")
      .join(rep.filter(col("vec_id") >= 100000000L && col("vec_id") < 200000000L).as("b"),
        col("a.vec_id") === col("b.vec_id") - 100000000L)
      .select(
        expr("aggregate(a.embedding, 0D, (s, x) -> s + cast(x as double) * x)").as("n0"),
        expr("aggregate(b.embedding, 0D, (s, x) -> s + cast(x as double) * x)").as("n1"),
        expr("aggregate(zip_with(a.embedding, b.embedding, (x, y) -> cast(x as double) * y), 0D, (s, v) -> s + v)").as("dot"))
    // norms bit-preserved (sign flip only)
    assert(pairs.filter(col("n0") =!= col("n1")).count() === 0L)
    // cross-copy cosine scrambled: mean |cos| well under self-similarity 1
    val meanAbs = pairs
      .select(avg(abs(col("dot") / sqrt(col("n0") * col("n1"))))).head.getDouble(0)
    assert(meanAbs < 0.5, s"cross-copy |cosine| should collapse, got $meanAbs")
  }
}
