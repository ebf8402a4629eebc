package graft.etl

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for the append-maintained index tables — the
  * 100 TB maintenance job the incremental paths make necessary: every
  * per-batch append ([[IncrementalDedup.ingest]], [[AnnIndex.appendLsh]] /
  * `appendIvf` / `appendSq8`) lands at least one new parquet file per
  * touched partition directory, and after thousands of ingest batches a
  * probe's "pruned" scan opens thousands of KB-sized files — the scan cost
  * becomes file-open bound, not byte bound. Compaction rewrites a table to
  * one file per partition directory (`repartition` on the partition
  * columns → each directory's rows land in exactly one task) and swaps the
  * rewrite into place.
  *
  * Contract: compaction changes FILE LAYOUT only — the row set, the
  * partition-directory structure (so `PartitionFilters` pruning keeps
  * working), and every probe result are unchanged (spec-asserted for the
  * LSH and dedup-posting tables).
  *
  * The directory swap is rename-based: correct for this repo's local-FS
  * persistence and the quiet-window maintenance pattern; a production
  * object-store deployment would run the same rewrite under a table format
  * (manifest commit) instead of a rename. */
object Compaction {

  /** Rewrite the parquet table at `path` to one file per partition
    * directory (or `numFiles` total when `partitionCols` is empty — size
    * it to the table at scale; the default 1 fits the gate-SF indexes) and
    * swap it into place. Returns (dataFilesBefore, dataFilesAfter). */
  /** A previous run that died mid-swap leaves `.compact-*` (rewrite never
    * swapped in) or `.old-*` (retired tree never deleted) siblings; both
    * are garbage once `path` itself exists, so every compaction entry point
    * reclaims them first — otherwise each failed run leaks a full table
    * copy forever.
    *
    * SINGLE-MAINTAINER CONTRACT (as the object scaladoc's quiet-window
    * posture already requires for the rename swap): this reclaim assumes no
    * OTHER compaction of the same table is in flight — a concurrent run's
    * live `.compact-*` tmp dir is indistinguishable from a dead one's
    * orphan and would be deleted. Concurrent compaction of the same table
    * was never safe here (two rename swaps race destructively regardless);
    * a production object-store deployment gets both properties from the
    * table format's manifest commit instead. */
  private[etl] def reclaimOrphans(path: String): Unit = {
    recoverInterrupted(path)
    val parent = Paths.get(path).toAbsolutePath.getParent
    val prefix = Paths.get(path).getFileName.toString
    if (parent != null && Files.isDirectory(parent) &&
        Files.exists(Paths.get(path))) {
      import scala.jdk.CollectionConverters._
      val siblings = Files.list(parent)
      try siblings.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith(prefix + ".compact-") || n.startsWith(prefix + ".old-")
        }
        .toSeq.foreach(deleteRecursively)
      finally siblings.close()
    }
  }

  /** CRASH RECOVERY for the rename swap: a death between [[swapIn]]'s two
    * moves leaves NO `path` but a complete `.old-*` retired tree — the
    * full pre-compaction table. Without recovery that state is a silent
    * catastrophe for the streaming indexes: their readers treat a missing
    * dir as an EMPTY index (the legitimate first-batch case), so a
    * restarted ingest would re-admit near-dups of everything, then a later
    * compaction's orphan reclaim would delete the `.old-*` copy for good.
    * This restores the newest `.old-*` tree back to `path` when `path` is
    * absent (the `.compact-*` rewrite, even when complete, holds the same
    * rows — restoring the ORIGINAL is always correct and never guesses
    * about a partially-written rewrite). Called by every compaction entry
    * point and by [[graft.stream.Streams.corpusIngest]] BEFORE the batch
    * body reads any index. Returns true if a restore happened. */
  def recoverInterrupted(path: String): Boolean = {
    val parent = Paths.get(path).toAbsolutePath.getParent
    val prefix = Paths.get(path).getFileName.toString
    if (parent == null || !Files.isDirectory(parent) ||
        Files.exists(Paths.get(path))) return false
    import scala.jdk.CollectionConverters._
    val olds = {
      val s = Files.list(parent)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith(prefix + ".old-"))
        .toSeq
      finally s.close()
    }
    if (olds.isEmpty) false
    else {
      // newest by mtime — at most one can exist per crashed run, but be
      // deterministic if an operator somehow accumulated several
      val chosen = olds.maxBy(Files.getLastModifiedTime(_).toMillis)
      Files.move(chosen, Paths.get(path))
      (olds.toSet - chosen).foreach(deleteRecursively)
      true
    }
  }

  /** Swap the finished rewrite at `tmp` into `path`: retire the old tree,
    * move the rewrite into place, delete the retired copy. */
  private def swapIn(path: String, tmp: String): Unit = {
    val old = Paths.get(path + ".old-" + java.util.UUID.randomUUID())
    Files.move(Paths.get(path), old)
    Files.move(Paths.get(tmp), Paths.get(path))
    deleteRecursively(old)
  }

  /** `coalesceBatchKeyed`: ONLY for the batch_id-partitioned streaming
    * index layouts (AnnIndex.appendLsh/appendSq8,
    * IncrementalDedup.commitPostings — the convenience wrappers below pass
    * it): compaction COALESCES the per-batch partitions into the single
    * `batch_id=-1` base level — sound under the object-level quiet-window
    * contract (every batch folded here is checkpoint-committed, so none
    * can replay and collide with the base). It is an EXPLICIT opt-in, not
    * a column-name sniff: a generic table that happens to carry a
    * `batch_id` DATA column (e.g. annServe's results, where batch_id is
    * provenance) must never have its values rewritten by a compaction.
    *
    * `preserveBatchKeys` is the REPLAY HIGH-WATER-MARK GUARD on that
    * contract: batch partitions named here are NOT folded into the base —
    * they keep their `batch_id` value through the rewrite. The in-stream
    * maintenance cadence ([[graft.stream.Streams.corpusIngest]]) passes
    * the batch key it is currently committing, because that batch is not
    * yet durably checkpointed: folding it would defeat its replay's
    * `excludeBatchKey` filter — the replay would see its OWN postings as
    * pre-existing index state, drop its own docs, and diverge from the
    * original survivor set. Every EARLIER batch of the same lineage is
    * checkpoint-committed by the time batch N's body runs, so folding
    * those (and any dead lineage's keys) is safe. */
  def compactParquet(spark: SparkSession, path: String,
                     partitionCols: Seq[String],
                     numFiles: Int = 1,
                     coalesceBatchKeyed: Boolean = false,
                     preserveBatchKeys: Set[String] = Set.empty): (Long, Long) = {
    reclaimOrphans(path)
    val before = dataFileCount(Paths.get(path))
    val df0 = spark.read.parquet(path)
    // a pre-r11 FLAT table has no batch level yet — compact it as-is (the
    // first batch-keyed write migrates the layout; failing the maintenance
    // job on a table that compacted fine before would be a regression)
    val coalesceBatches = coalesceBatchKeyed &&
      df0.columns.contains("batch_id") && !partitionCols.contains("batch_id")
    val df =
      if (coalesceBatches) {
        import org.apache.spark.sql.functions.{lit, when}
        val folded =
          if (preserveBatchKeys.isEmpty) lit("-1")
          else when(col("batch_id").isin(preserveBatchKeys.toSeq: _*),
            col("batch_id")).otherwise(lit("-1"))
        df0.withColumn("batch_id", folded)
      }
      else df0
    val writeCols =
      if (coalesceBatches) partitionCols :+ "batch_id" else partitionCols
    val tmp = path + ".compact-" + java.util.UUID.randomUUID()
    val repartitioned =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df.repartition(numFiles)
    val writer = repartitioned.write.mode("overwrite")
    (if (writeCols.nonEmpty) writer.partitionBy(writeCols: _*) else writer)
      .parquet(tmp)
    swapIn(path, tmp)
    (before, dataFileCount(Paths.get(path)))
  }

  /** [[AnnIndex]] convenience wrappers — partition columns match each
    * index's declared layout. */
  def compactLshPostings(spark: SparkSession, indexDir: String,
                         preserveBatchKeys: Set[String] = Set.empty): (Long, Long) =
    compactParquet(spark, s"$indexDir/buckets", Seq("band", "bkt"),
      coalesceBatchKeyed = true, preserveBatchKeys = preserveBatchKeys)
  def compactIvfLists(spark: SparkSession, indexDir: String): (Long, Long) =
    compactParquet(spark, s"$indexDir/lists", Seq("list_id"))
  def compactSq8(spark: SparkSession, indexDir: String,
                 preserveBatchKeys: Set[String] = Set.empty): (Long, Long) =
    compactParquet(spark, s"$indexDir/sq8", Nil, coalesceBatchKeyed = true,
      preserveBatchKeys = preserveBatchKeys)
  def compactPqCodes(spark: SparkSession, indexDir: String): (Long, Long) =
    compactParquet(spark, s"$indexDir/codes", Nil)
  /** The IVF-PQ composite's per-list code dirs ([[AnnIndex.buildIvfPq]] /
    * `appendIvfPq` — `codes/list_id=` partitioning; the `codebooks` table
    * is a single coalesced file and never fragments). */
  def compactIvfPqCodes(spark: SparkSession, indexDir: String): (Long, Long) =
    compactParquet(spark, s"$indexDir/codes", Seq("list_id"))

  /** The dedup posting table ([[IncrementalDedup]]) — unpartitioned
    * appends, joined on (band, bkey) per ingest batch. */
  def compactDedupPostings(spark: SparkSession, indexDir: String,
                           preserveBatchKeys: Set[String] = Set.empty): (Long, Long) =
    compactParquet(spark, s"$indexDir/postings", Nil, coalesceBatchKeyed = true,
      preserveBatchKeys = preserveBatchKeys)

  /** Z-ORDERED compaction — the OPTIMIZE ZORDER maintenance form: rewrite
    * the table CLUSTERED on the Morton interleave of two numeric columns
    * (each grid-quantized from its observed bounds, the same recipe as
    * `q_zorder_layout`), range-partitioned and sorted by the z key, then
    * swapped in. Every file then carries narrow min/max bounds in BOTH
    * dimensions, so scans filtered on either (or both) skip files — where
    * plain [[compactParquet]] only fixes the file-count problem and a
    * single-column sort only bounds its own column. Row set unchanged
    * (CompactionSpec asserts set equality and measures the per-file span
    * shrink). Bounds are one 1-row aggregate; everything else is the
    * rewrite itself. */
  def compactZOrdered(spark: SparkSession, path: String,
                      xCol: String, yCol: String,
                      numFiles: Int = 8): (Long, Long) = {
    graft.expr.GraftFunctions.ensureRegistered(spark)
    reclaimOrphans(path)
    val before = dataFileCount(Paths.get(path))
    val df = spark.read.parquet(path)
    val b = df.agg(
      org.apache.spark.sql.functions.min(col(xCol).cast("long")),
      org.apache.spark.sql.functions.max(col(xCol).cast("long")),
      org.apache.spark.sql.functions.min(col(yCol).cast("long")),
      org.apache.spark.sql.functions.max(col(yCol).cast("long"))).collect().head
    // empty table / all-null cluster columns: no bounds to quantize from —
    // degrade to the plain file-count rewrite instead of NPEing on getLong
    if (b.isNullAt(0) || b.isNullAt(2))
      return compactParquet(spark, path, Nil, numFiles)
    val (xlo, xhi, ylo, yhi) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    // Overflow-safe quantization over ARBITRARY long ranges (this is a
    // generic API — a naive `(x - xlo) * 256 div span` overflows long as
    // soon as the observed span exceeds Long.MaxValue/256 and silently
    // mis-clusters): precompute the cell width as ceil(span/256) in BigInt
    // (span itself can exceed Long range), then quantize as
    // `(x - xlo) div cellW` with the subtraction done in DECIMAL(38,0) so
    // extreme bounds cannot wrap. cellW ≤ 2^56, cell ≤ 255 by construction.
    def cellW(hi: Long, lo: Long): Long =
      (((BigInt(hi) - BigInt(lo) + 1) + 255) / 256).max(1).toLong
    val (xw, yw) = (cellW(xhi, xlo), cellW(yhi, ylo))
    import org.apache.spark.sql.functions.{call_function, expr}
    val zed = df
      .withColumn("__zx",
        expr(s"cast((cast($xCol as decimal(38,0)) - $xlo) div $xw as int)"))
      .withColumn("__zy",
        expr(s"cast((cast($yCol as decimal(38,0)) - $ylo) div $yw as int)"))
      .withColumn("__z", call_function("morton32", col("__zx"), col("__zy")))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__zx", "__zy", "__z")
    val tmp = path + ".compact-" + java.util.UUID.randomUUID()
    zed.write.mode("overwrite").parquet(tmp)
    swapIn(path, tmp)
    (before, dataFileCount(Paths.get(path)))
  }

  private def dataFileCount(root: Path): Long = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(root)
    try s.iterator().asScala.count { p =>
      val n = p.getFileName.toString
      Files.isRegularFile(p) && n.endsWith(".parquet") && !n.startsWith(".")
    }
    finally s.close()
  }

  /** Shared recursive delete (ONE copy of the walk-reverse-delete idiom —
    * also used by [[AvroSource]] and [[graft.stream.Streams]]). */
  private[graft] def deleteRecursively(dir: Path): Unit =
    if (Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      val s = Files.walk(dir)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
}
