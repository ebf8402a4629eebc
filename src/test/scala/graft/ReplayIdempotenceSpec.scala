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
    AnnIndex.appendLsh(vecs(0 until 20), idx, bands = 3, bits = 8, Some("q1-7"))
    val c1 = spark.read.parquet(s"$idx/buckets").count()
    AnnIndex.appendLsh(vecs(0 until 20), idx, bands = 3, bits = 8, Some("q1-7"))
    assert(spark.read.parquet(s"$idx/buckets").count() === c1,
      "a same-batch-id replay must rewrite its cells, not append")
    AnnIndex.appendLsh(vecs(20 until 30), idx, bands = 3, bits = 8, Some("q1-8"))
    assert(spark.read.parquet(s"$idx/buckets").count() > c1,
      "a NEW batch id must add postings")
    assert(spark.read.parquet(s"$idx/buckets")
      .select("vec_id").distinct().count() === 30,
      "the batch_id level must stay transparent to readers")
  }

  test("appendSq8 under a batch id: replay rewrites its own partition; ad-hoc appends still append") {
    val idx = Files.createTempDirectory("graft_replay_sq8").toString
    def n = spark.read.parquet(s"$idx/sq8").count()
    AnnIndex.appendSq8(vecs(0 until 20), idx, Some("q1-3"))
    assert(n === 20)
    AnnIndex.appendSq8(vecs(0 until 20), idx, Some("q1-3"))
    assert(n === 20, "a same-batch-id replay must not grow the SQ8 index")
    AnnIndex.appendSq8(vecs(20 until 25), idx, Some("q1-4"))
    assert(n === 25)
    AnnIndex.appendSq8(vecs(25 until 26), idx)
    assert(n === 26, "a batch-less append lands under the base partition")
  }

  test("commitPostings under a batch id: a replay heals a partially-landed commit whole") {
    val idx = Files.createTempDirectory("graft_replay_posts").toString
    val posts = Seq((0, "k1", 1L), (0, "k2", 2L), (1, "k3", 1L))
      .toDF("band", "bkey", "doc_id")
    IncrementalDedup.commitPostings(posts, idx, Some("q1-5"))
    assert(spark.read.parquet(s"$idx/postings").count() === 3)
    IncrementalDedup.commitPostings(posts, idx, Some("q1-5"))
    assert(spark.read.parquet(s"$idx/postings").count() === 3,
      "a same-batch-id replay must rewrite, not append")
    // simulate a PARTIAL landing (crash mid-commit left only a subset in
    // batch 5's partition), then replay the full commit: the partition
    // overwrite must restore the complete posting set
    IncrementalDedup.commitPostings(posts.filter(col("doc_id") === 1L), idx, Some("q1-5"))
    assert(spark.read.parquet(s"$idx/postings").count() === 2)
    IncrementalDedup.commitPostings(posts, idx, Some("q1-5"))
    assert(spark.read.parquet(s"$idx/postings").count() === 3,
      "the replayed commit must heal the partial landing whole")
  }

  test("keptPostings excludeBatchId: a replay sees the pre-batch index and re-derives the original survivors") {
    val idx = Files.createTempDirectory("graft_replay_kept").toString
    val b = Seq((1L, "alpha bravo charlie delta echo"),
                (2L, "foxtrot golf hotel india juliet"))
      .toDF("doc_id", "text")
    val kept0 = IncrementalDedup.keptPostings(b, idx, excludeBatchKey = Some("q1-4"))
    val rows0 = kept0.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[String]("bkey"))).toSet
    assert(rows0.map(_._1) === Set(1L, 2L))
    IncrementalDedup.commitPostings(kept0, idx, Some("q1-4"))
    // WITHOUT exclusion, a replayed doc collides with its own committed
    // postings and survives nothing (the batch-mode collision semantics)
    assert(IncrementalDedup.keptPostings(b, idx)
      .select("doc_id").distinct().count() === 0)
    // WITH its own batch id excluded, the replay recomputes against the
    // exact pre-batch state: identical posting rows come back
    val replay = IncrementalDedup
      .keptPostings(b, idx, excludeBatchKey = Some("q1-4")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[String]("bkey"))).toSet
    assert(replay === rows0,
      "the excluded-batch replay must re-derive the original survivor set")
    // a DIFFERENT batch id excludes nothing relevant and collides normally
    assert(IncrementalDedup
      .keptPostings(b, idx, excludeBatchKey = Some("q1-5"))
      .select("doc_id").distinct().count() === 0)
  }

  test("lineage isolation: a fresh-checkpoint restart reusing batch number 0 cannot clobber a prior lineage") {
    // run 1 (lineage q1) commits batch 0; run 2 restarts from a fresh
    // checkpoint (new query id q2) and its batch 0 writes under q2-0 —
    // q1-0's postings must survive untouched in every table
    val lsh = Files.createTempDirectory("graft_lineage_lsh").toString
    val sq8 = Files.createTempDirectory("graft_lineage_sq8").toString
    val posts = Files.createTempDirectory("graft_lineage_posts").toString
    AnnIndex.appendLsh(vecs(0 until 10), lsh, bands = 3, bits = 8, Some("q1-0"))
    AnnIndex.appendSq8(vecs(0 until 10), sq8, Some("q1-0"))
    val p1 = Seq((0, "cell-a", 1L), (0, "cell-b", 2L)).toDF("band", "bkey", "doc_id")
    IncrementalDedup.commitPostings(p1, posts, Some("q1-0"))

    AnnIndex.appendLsh(vecs(10 until 15), lsh, bands = 3, bits = 8, Some("q2-0"))
    AnnIndex.appendSq8(vecs(10 until 15), sq8, Some("q2-0"))
    val p2 = Seq((0, "cell-a", 9L)).toDF("band", "bkey", "doc_id")
    IncrementalDedup.commitPostings(p2, posts, Some("q2-0"))

    assert(spark.read.parquet(s"$lsh/buckets")
      .select("vec_id").distinct().count() === 15,
      "both lineages' LSH postings must coexist")
    assert(spark.read.parquet(s"$sq8/sq8").count() === 15,
      "both lineages' SQ8 rows must coexist")
    val docIds = spark.read.parquet(s"$posts/postings")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(docIds === Seq(1L, 2L, 9L),
      s"run 2's batch 0 must not wipe run 1's batch-0 postings, got $docIds")
  }

  test("legacy flat layouts upgrade in place on the first batch-keyed write") {
    // a pre-r11 index holds data files directly at the table root / cell
    // dirs; the first batch-keyed write must MOVE them under batch_id=-1
    // (metadata renames, no rewrite) so partition discovery keeps working
    val posts = Files.createTempDirectory("graft_legacy_posts").toString
    Seq((0, "old-a", 1L), (1, "old-b", 2L)).toDF("band", "bkey", "doc_id")
      .write.mode("append").parquet(s"$posts/postings") // the pre-r11 shape
    IncrementalDedup.commitPostings(
      Seq((0, "new-c", 3L)).toDF("band", "bkey", "doc_id"), posts, Some("q3-0"))
    val all = spark.read.parquet(s"$posts/postings")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(all === Seq(1L, 2L, 3L),
      s"legacy + batch-keyed postings must both be readable, got $all")

    val sq8 = Files.createTempDirectory("graft_legacy_sq8").toString
    graft.etl.AnnIndex.buildSq8(vecs(0 until 5), sq8) // writes batch_id=-1 already
    // craft a TRULY flat legacy sq8 dir: write without the batch col
    val flat = Files.createTempDirectory("graft_legacy_sq8b").toString
    spark.read.parquet(s"$sq8/sq8").drop("batch_id")
      .write.mode("overwrite").parquet(s"$flat/sq8")
    AnnIndex.appendSq8(vecs(5 until 8), flat, Some("q3-0"))
    assert(spark.read.parquet(s"$flat/sq8").count() === 8,
      "flat legacy sq8 rows must survive the layout upgrade")

    val lsh = Files.createTempDirectory("graft_legacy_lsh").toString
    graft.etl.AnnIndex.buildLsh(vecs(0 until 5), lsh, bands = 3, bits = 8)
    // strip the batch level to fabricate the pre-r11 cell layout
    val buckets = java.nio.file.Paths.get(s"$lsh/buckets")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(buckets).iterator().asScala.toSeq.foreach { f =>
      val n = f.getFileName.toString
      if (java.nio.file.Files.isRegularFile(f) && n.endsWith(".parquet")
          && f.getParent.getFileName.toString.startsWith("batch_id=")) {
        java.nio.file.Files.move(f, f.getParent.getParent.resolve(n))
      }
    }
    java.nio.file.Files.walk(buckets).iterator().asScala.toSeq
      .filter(d => java.nio.file.Files.isDirectory(d)
        && d.getFileName.toString.startsWith("batch_id="))
      .foreach { d => // drop the emptied batch dirs (and stray .crc files)
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    AnnIndex.appendLsh(vecs(5 until 8), lsh, bands = 3, bits = 8, Some("q3-0"))
    assert(spark.read.parquet(s"$lsh/buckets")
      .select("vec_id").distinct().count() === 8,
      "legacy LSH cells must survive the layout upgrade")
  }

  test("coalescing compaction preserves the in-flight batch key: a post-compaction replay still re-derives its survivors") {
    val idx = Files.createTempDirectory("graft_compact_preserve").toString
    val b0 = Seq((1L, "alpha bravo charlie delta echo")).toDF("doc_id", "text")
    val b1 = Seq((2L, "kilo lima mike november oscar")).toDF("doc_id", "text")
    IncrementalDedup.commitPostings(
      IncrementalDedup.keptPostings(b0, idx, excludeBatchKey = Some("q1-0")),
      idx, Some("q1-0"))
    val kept1 = IncrementalDedup
      .keptPostings(b1, idx, excludeBatchKey = Some("q1-1"))
    val rows1 = kept1.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[String]("bkey"))).toSet
    IncrementalDedup.commitPostings(kept1, idx, Some("q1-1"))
    // in-stream maintenance runs right after batch 1's commit, BEFORE the
    // checkpoint commits its offsets — batch 1 must survive the fold
    graft.etl.Compaction.compactDedupPostings(spark, idx,
      preserveBatchKeys = Set("q1-1"))
    val keys = spark.read
      .parquet(graft.etl.Compaction.currentPath(s"$idx/postings"))
      .select(col("batch_id").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(keys === Set("-1", "q1-1"),
      s"checkpointed batches fold to the base; the in-flight key survives — got $keys")
    // crash-replay of batch 1 after the compaction: its excludeBatchKey
    // filter still hides its own postings, so it re-derives the original
    // survivor set (the ADVICE r11 divergence scenario, prevented)
    val replay = IncrementalDedup
      .keptPostings(b1, idx, excludeBatchKey = Some("q1-1")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band"),
        r.getAs[String]("bkey"))).toSet
    assert(replay === rows1,
      "a replay after guarded compaction must re-derive the original survivors")
    // the hazard the guard exists for: an UNGUARDED coalesce folds q1-1
    // into the base, the replay sees its own postings as stored state,
    // and drops its own doc — divergence
    graft.etl.Compaction.compactDedupPostings(spark, idx)
    assert(IncrementalDedup
      .keptPostings(b1, idx, excludeBatchKey = Some("q1-1"))
      .select("doc_id").distinct().count() === 0,
      "unguarded coalesce demonstrably defeats the replay exclusion " +
        "(this is why corpusIngest passes preserveBatchKeys)")
  }
}
