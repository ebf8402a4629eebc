package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.IncrementalDedup
import graft.queries.Llm

/** Continuous-ingest dedup contracts (SURVEY.md §2.9 / §4): a batch is
  * deduped against the persisted posting index in O(batch) work — no
  * corpus re-hash — and the index keeps the bucket-unique invariant that
  * makes the collision check sound. */
class IncrementalDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def docs = Tables.documents(spark, TestSpark.sfDir)

  test("first batch: incremental ingest equals the batch q_dedup_keep semantics") {
    val idx = Files.createTempDirectory("graft_inc_idx").toString
    val b1 = docs.filter(col("doc_id") < 250)
    val kept = IncrementalDedup.ingest(b1, idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dropped = Llm.dedupGroups(Llm.minhashPairs(b1))
      .filter(col("doc_id") =!= col("group_id"))
      .collect().map(_.getLong(0)).toSet
    val expected = b1.select("doc_id").collect().map(_.getLong(0)).toSet -- dropped
    assert(kept === expected,
      "incremental first-batch result diverges from the batch dedup path")
  }

  test("two batches: bucket-unique index, cross-batch drops, replay re-admits none kept") {
    val idx = Files.createTempDirectory("graft_inc_idx2").toString
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val kept1 = IncrementalDedup.ingest(b1, idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val k2 = IncrementalDedup.ingest(b2, idx).count()
    assert(kept1.nonEmpty && k2 > 0)
    assert(k2 < b2.count(), "second batch should lose docs to cross-batch collisions")
    def maxPerCell = spark.read.parquet(s"$idx/postings")
      .groupBy("band", "bkey").count().agg(max("count")).head().getLong(0)
    // invariant: every (band, bkey) cell holds at most ONE kept doc — two
    // docs sharing a cell are a candidate pair, and one always loses
    assert(maxPerCell === 1L, "a posting cell holds two kept docs")
    // replay: every already-indexed doc collides with its own stored
    // postings and is dropped; only earlier chain-dropped docs (whose
    // duplicates were never indexed) may be re-admitted — greedily correct,
    // and the bucket-unique invariant must survive the replay too
    val replay = IncrementalDedup.ingest(b1, idx)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(replay.intersect(kept1).isEmpty,
      "replay re-admitted docs that are already in the index")
    assert(maxPerCell === 1L, "replay broke the bucket-unique invariant")
  }
}
