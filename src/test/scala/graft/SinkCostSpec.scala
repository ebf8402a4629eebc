package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.BucketedTable
import graft.stream.Streams

/** EMPIRICAL cost-model proof for the bucketed sinks (r11 #2): StreamingSpec
  * proves untouched-bucket BYTE IDENTITY; this spec proves the COST claim —
  * a constant-size micro-batch against a ~100×-grown state table commits
  * O(batch + touched-bucket bytes), a bounded fraction of the table, and
  * the per-batch committed bytes stay flat across successive batches. The
  * r10 full-republish sink (rewrite the whole table every batch) fails
  * every assert here: its per-commit bytes equal the table. */
class SinkCostSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val nB = 64

  /** Parquet bytes under one committed version dir — exactly what the
    * commit wrote (manifest text excluded; it is O(nBuckets) lines). */
  private def versionBytes(tableDir: String, v: Long): Long = {
    val root = Paths.get(s"$tableDir/v=$v")
    import scala.jdk.CollectionConverters._
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(Files.size(_)).sum
    finally s.close()
  }

  private def pad(i: Long) = f"payload-$i%06d-" + "x" * 80

  test("upsertBatch: constant batches against a 20k-row state commit a bounded slice, flat across batches") {
    val dir = Files.createTempDirectory("graft_cost_upsert").resolve("t").toString
    val seed = (0L until 20000L).map(i => (i, pad(i), 0L)).toDF("k", "v", "seq")
    Streams.upsertBatch(seed, dir, Seq("k"), "seq", nB)
    val tableBytes = versionBytes(dir, BucketedTable.currentVersion(dir))
    // constant 3-key batches (same keys each round: the steady-state upsert)
    val commits = (1 to 3).map { n =>
      val batch = (0L until 3L).map(j => (j * 7919L % 20000L, pad(j), n.toLong))
        .toDF("k", "v", "seq")
      Streams.upsertBatch(batch, dir, Seq("k"), "seq", nB)
      versionBytes(dir, BucketedTable.currentVersion(dir))
    }
    // bounded: each commit rewrites ≤ 3 of 64 buckets (~5% of the table);
    // the r10 full republish would be ~100% and fail the 8× margin
    assert(commits.max * 8 < tableBytes,
      s"per-batch committed bytes ${commits} must be a small fraction of " +
        s"the $tableBytes-byte table — a full republish would fail this")
    // flat: successive constant-size batches commit the same bytes (same
    // touched buckets, same fold) — growth in batch COUNT costs nothing
    assert(commits.max <= commits.min * 2,
      s"committed bytes must stay flat across constant batches, got $commits")
  }

  test("scd2ApplyBatch: constant CDC batches against a 20k-key history commit a bounded slice, flat across batches") {
    import java.sql.Timestamp
    val dir = Files.createTempDirectory("graft_cost_scd2").resolve("t").toString
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    val seed = (0L until 20000L).map(i => (i, i, pad(i), t(1), "I"))
      .toDF("seq", "k", "attr", "eff", "flag")
    Streams.scd2ApplyBatch(seed, dir, Seq("k"), "seq", "flag", "eff", nB)
    val tableBytes = versionBytes(dir, BucketedTable.currentVersion(dir))
    val commits = (2 to 4).map { day =>
      val batch = (0L until 3L).map(j => (100000L + day * 10 + j,
          j * 7919L % 20000L, pad(day * 10 + j), t(day), "U"))
        .toDF("seq", "k", "attr", "eff", "flag")
      Streams.scd2ApplyBatch(batch, dir, Seq("k"), "seq", "flag", "eff", nB)
      versionBytes(dir, BucketedTable.currentVersion(dir))
    }
    assert(commits.max * 8 < tableBytes,
      s"per-batch committed bytes ${commits} must be a small fraction of " +
        s"the $tableBytes-byte history — a full republish would fail this")
    // Type-2 history GROWS in the touched buckets (each update appends a
    // version), so allow that trend but keep it in the same decade
    assert(commits.max <= commits.min * 3,
      s"committed bytes must stay near-flat across constant batches, got $commits")
  }

  test("corpusIngest: a small batch against a 2000-doc corpus commits a bounded slice of the corpus table") {
    implicit val sqlCtx = spark.sqlContext
    val dedupDir = Files.createTempDirectory("graft_cost_ci_dedup").toString
    val lshDir = Files.createTempDirectory("graft_cost_ci_lsh").toString
    val corpusDir = Files.createTempDirectory("graft_cost_ci_corpus").toString
    def emb(seed: Int): Array[Float] =
      Array.tabulate(8)(i => math.sin(seed * 31 + i).toFloat)
    // per-doc unique token sets: nothing near-dups, everything survives
    def doc(id: Long) = IngestDoc(id,
      (0 until 5).map(t => s"u${id}t$t").mkString(" ") + " " + pad(id),
      emb(id.toInt))
    val mem = MemoryStream[IngestDoc]
    val q = Streams.corpusIngest(mem.toDF(), dedupDir, lshDir, corpusDir)
      .start()
    try {
      mem.addData((0L until 2000L).map(doc): _*); q.processAllAvailable()
      val tableBytes =
        versionBytes(corpusDir, BucketedTable.currentVersion(corpusDir))
      mem.addData((2000L until 2003L).map(doc): _*); q.processAllAvailable()
      val smallBytes =
        versionBytes(corpusDir, BucketedTable.currentVersion(corpusDir))
      assert(BucketedTable.readCurrent(spark, corpusDir).count() === 2003L)
      assert(smallBytes * 8 < tableBytes,
        s"a 3-doc batch committed $smallBytes bytes against a $tableBytes-" +
          "byte corpus — must rewrite only its touched buckets, not the table")
    } finally q.stop()
  }

  /** Every data file under a table root, by path → size. */
  private def fileSizes(root: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(Paths.get(root))
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => p.toString -> Files.size(p)).toMap
    finally s.close()
  }

  test("corpusIngest trainable-composite appends: a small batch leaves every pre-existing index file byte-identical") {
    // The cost claim for the MODEL-DEPENDENT index tables is sharper than a
    // byte ratio: a frozen-model append writes ONLY its own batch cells —
    // every file the index held before the batch survives untouched (same
    // path, same size). A per-batch re-encode or re-cluster would fail
    // this on the first append.
    implicit val sqlCtx = spark.sqlContext
    val dedupDir = Files.createTempDirectory("graft_cost_ivf_dedup").toString
    val lshDir = Files.createTempDirectory("graft_cost_ivf_lsh").toString
    val corpusDir = Files.createTempDirectory("graft_cost_ivf_corpus").toString
    val ivfDir = Files.createTempDirectory("graft_cost_ivf_ivf").toString
    val ivfPqDir = Files.createTempDirectory("graft_cost_ivf_ivfpq").toString
    def emb(seed: Int): Array[Float] =
      Array.tabulate(8)(i => math.sin(seed * 31 + i).toFloat)
    def doc(id: Long) = IngestDoc(id,
      (0 until 5).map(t => s"u${id}t$t").mkString(" ") + " " + pad(id),
      emb(id.toInt))
    val mem = MemoryStream[IngestDoc]
    // no retrain/compaction cadence: this measures the pure append path
    val q = Streams.corpusIngest(mem.toDF(), dedupDir, lshDir, corpusDir,
      ivfDir = Some(ivfDir), ivfNlist = 8,
      ivfPqDir = Some(ivfPqDir), pqM = 4, pqK = 8).start()
    try {
      mem.addData((0L until 300L).map(doc): _*); q.processAllAvailable()
      val listsRoot = graft.etl.Compaction.currentPath(s"$ivfDir/lists")
      val codesRoot = graft.etl.Compaction.currentPath(s"$ivfPqDir/codes")
      val preLists = fileSizes(listsRoot)
      val preCodes = fileSizes(codesRoot)
      assert(preLists.nonEmpty && preCodes.nonEmpty)
      mem.addData((300L until 303L).map(doc): _*); q.processAllAvailable()
      val postLists = fileSizes(listsRoot)
      val postCodes = fileSizes(codesRoot)
      for ((pre, post, what) <- Seq((preLists, postLists, "lists"),
                                    (preCodes, postCodes, "codes"))) {
        pre.foreach { case (p, sz) =>
          assert(post.get(p).contains(sz),
            s"$what: pre-existing file $p must survive an append byte-identical")
        }
        assert(post.size > pre.size, s"$what: the batch must have landed")
      }
      // and the new rows are exactly the batch, in both tables
      assert(spark.read.parquet(listsRoot).count() === 303L)
      assert(spark.read.parquet(codesRoot).count() === 303L)
    } finally q.stop()
  }
}
