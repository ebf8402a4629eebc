package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{AnnIndex, IncrementalDedup}

/** At-least-once replay contracts of the batch_id-keyed index writes
  * (SURVEY.md §2.9/§2.10 incremental maintenance): a streaming micro-batch
  * that re-delivers after a crash must OVERWRITE its own `batch_id=`
  * partitions — never append duplicate postings, and a partially-landed
  * commit must heal whole on replay. These are the unit-level twins of the
  * composed StreamingSpec corpus-ingest replay cases, exercising a TRUE
  * same-batch-id replay (the MemoryStream path can only produce fresh
  * ids). */
class ReplayIdempotenceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(ids: Range) = ids.map(i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 31 + j).toFloat)))
    .toDF("vec_id", "embedding")

  test("appendLsh under a batch id: replay overwrites its own cells; a new batch adds; probes see all") {
    val idx = Files.createTempDirectory("graft_replay_lsh").toString
    AnnIndex.appendLsh(vecs(0 until 20), idx, bands = 3, bits = 8, Some(7L))
    val c1 = spark.read.parquet(s"$idx/buckets").count()
    AnnIndex.appendLsh(vecs(0 until 20), idx, bands = 3, bits = 8, Some(7L))
    assert(spark.read.parquet(s"$idx/buckets").count() === c1,
      "a same-batch-id replay must rewrite its cells, not append")
    AnnIndex.appendLsh(vecs(20 until 30), idx, bands = 3, bits = 8, Some(8L))
    assert(spark.read.parquet(s"$idx/buckets").count() > c1,
      "a NEW batch id must add postings")
    assert(spark.read.parquet(s"$idx/buckets")
      .select("vec_id").distinct().count() === 30,
      "the batch_id level must stay transparent to readers")
  }

  test("appendSq8 under a batch id: replay rewrites its own partition; ad-hoc appends still append") {
    val idx = Files.createTempDirectory("graft_replay_sq8").toString
    def n = spark.read.parquet(s"$idx/sq8").count()
    AnnIndex.appendSq8(vecs(0 until 20), idx, Some(3L))
    assert(n === 20)
    AnnIndex.appendSq8(vecs(0 until 20), idx, Some(3L))
    assert(n === 20, "a same-batch-id replay must not grow the SQ8 index")
    AnnIndex.appendSq8(vecs(20 until 25), idx, Some(4L))
    assert(n === 25)
    AnnIndex.appendSq8(vecs(25 until 26), idx)
    assert(n === 26, "a batch-less append lands under the base partition")
  }

  test("commitPostings under a batch id: a replay heals a partially-landed commit whole") {
    val idx = Files.createTempDirectory("graft_replay_posts").toString
    val posts = Seq((0, "k1", 1L), (0, "k2", 2L), (1, "k3", 1L))
      .toDF("band", "bkey", "doc_id")
    IncrementalDedup.commitPostings(posts, idx, Some(5L))
    assert(spark.read.parquet(s"$idx/postings").count() === 3)
    IncrementalDedup.commitPostings(posts, idx, Some(5L))
    assert(spark.read.parquet(s"$idx/postings").count() === 3,
      "a same-batch-id replay must rewrite, not append")
    // simulate a PARTIAL landing (crash mid-commit left only a subset in
    // batch 5's partition), then replay the full commit: the partition
    // overwrite must restore the complete posting set
    IncrementalDedup.commitPostings(posts.filter(col("doc_id") === 1L), idx, Some(5L))
    assert(spark.read.parquet(s"$idx/postings").count() === 2)
    IncrementalDedup.commitPostings(posts, idx, Some(5L))
    assert(spark.read.parquet(s"$idx/postings").count() === 3,
      "the replayed commit must heal the partial landing whole")
  }

  test("keptPostings excludeBatchId: a replay sees the pre-batch index and re-derives the original survivors") {
    val idx = Files.createTempDirectory("graft_replay_kept").toString
    val b = Seq((1L, "alpha bravo charlie delta echo"),
                (2L, "foxtrot golf hotel india juliet"))
      .toDF("doc_id", "text")
    val kept0 = IncrementalDedup.keptPostings(b, idx, excludeBatchId = Some(4L))
    val rows0 = kept0.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[String]("bkey"))).toSet
    assert(rows0.map(_._1) === Set(1L, 2L))
    IncrementalDedup.commitPostings(kept0, idx, Some(4L))
    // WITHOUT exclusion, a replayed doc collides with its own committed
    // postings and survives nothing (the batch-mode collision semantics)
    assert(IncrementalDedup.keptPostings(b, idx)
      .select("doc_id").distinct().count() === 0)
    // WITH its own batch id excluded, the replay recomputes against the
    // exact pre-batch state: identical posting rows come back
    val replay = IncrementalDedup
      .keptPostings(b, idx, excludeBatchId = Some(4L)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[String]("bkey"))).toSet
    assert(replay === rows0,
      "the excluded-batch replay must re-derive the original survivor set")
    // a DIFFERENT batch id excludes nothing relevant and collides normally
    assert(IncrementalDedup
      .keptPostings(b, idx, excludeBatchId = Some(5L))
      .select("doc_id").distinct().count() === 0)
  }
}
