package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed incremental table — the scale-correct state store for the
  * streaming sinks ([[graft.stream.Streams.upsertToParquet]] /
  * `scd2Sink` / `corpusIngest`): a micro-batch rewrites ONLY the key-hash
  * buckets it touches, and every untouched bucket carries over into the new
  * snapshot BY MANIFEST REFERENCE — zero data movement, the same
  * append-files commit a transactional table format (Delta/Iceberg) makes.
  * Per-batch write cost is O(batch + touched-bucket bytes) ≈
  * O(batch · tableBytes / nBuckets), never O(table) — the difference
  * between a demo sink and a 100 TB dimension maintained per micro-batch.
  *
  * Layout:
  * {{{
  *   tableDir/v=N/gbucket=B/part-*.parquet   -- bucket B's data written at commit N
  *   tableDir/v=N/_MANIFEST                  -- bucket -> version holding its data
  *   tableDir/_CURRENT                       -- pointer to the committed manifest
  * }}}
  *
  * The COMMIT is one atomic pointer rename (the [[Warehouse.publish]]
  * contract): a reader resolves `_CURRENT` once, loads that immutable
  * manifest, and scans exactly the bucket directories it names — it sees
  * entirely-old or entirely-new state, never a mix. Superseded bucket
  * versions stay readable (time travel) until [[vacuum]], which drops every
  * version directory the current manifest no longer references.
  *
  * Bucketing is a deterministic key hash ([[bucketExpr]] — xxhash64 mod
  * nBuckets), so the same key always lands in the same bucket and a
  * reader/writer never needs a shuffle to locate it. `nBuckets` is fixed at
  * table creation (asserted on every commit): size it so one bucket's bytes
  * fit an executor comfortably at the target scale (64 here; thousands for
  * a 100 TB dimension).
  *
  * Concurrency contract: ONE writer (the owning streaming sink — the
  * standard foreachBatch discipline). Readers are lock-free and unlimited.
  * Two concurrent writers would each build a manifest missing the other's
  * buckets and the last pointer rename would silently drop one commit —
  * exactly why multi-writer table formats need optimistic manifest CAS,
  * which a local pointer file cannot express. */
object BucketedTable {

  /** The internal partition column name (never visible to readers — bucket
    * directories are read WITHOUT basePath, so the column is not
    * reconstituted into the scan schema). */
  val BucketCol = "gbucket"

  /** Deterministic bucket id of a key tuple: xxhash64 mod nBuckets. */
  def bucketExpr(keyCols: Seq[String], nBuckets: Int): Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets.toLong)).cast("int")

  /** The committed manifest: fixed bucket count plus, per bucket that has
    * ever held rows, the version directory holding its current data. */
  final case class Manifest(nBuckets: Int, buckets: Map[Int, Long])

  def exists(tableDir: String): Boolean =
    Files.exists(Paths.get(tableDir, "_CURRENT"))

  /** The version the `_CURRENT` pointer names (fails if never committed). */
  def currentVersion(tableDir: String): Long =
    Files.readString(Paths.get(tableDir, "_CURRENT")).trim.toLong

  def readManifest(tableDir: String, version: Option[Long] = None): Manifest = {
    val v = version.getOrElse(currentVersion(tableDir))
    val lines = Files.readAllLines(Paths.get(tableDir, s"v=$v", "_MANIFEST"))
    val n = lines.get(0).stripPrefix("nBuckets=").toInt
    import scala.jdk.CollectionConverters._
    val m = lines.asScala.drop(1).filter(_.nonEmpty).map { l =>
      val Array(b, ver) = l.split(' '); b.toInt -> ver.toLong
    }.toMap
    Manifest(n, m)
  }

  /** On-disk directories holding the named buckets' current data (buckets
    * that never held rows, or whose last rewrite produced no rows, simply
    * have no directory and read as empty). */
  private def bucketDirs(tableDir: String, m: Manifest,
                         buckets: Seq[Int]): Seq[String] =
    buckets.distinct.sorted.flatMap(b => m.buckets.get(b).map(v =>
        s"$tableDir/v=$v/$BucketCol=$b"))
      .filter(p => Files.exists(Paths.get(p)))

  /** Scan ONLY the named buckets of the current snapshot — the keyed-slice
    * read a micro-batch fold needs: file listing and bytes are bounded by
    * the touched buckets, not the table. Returns `empty` when no named
    * bucket has data (schema comes from the caller, who knows it). */
  def readBuckets(spark: SparkSession, tableDir: String, buckets: Seq[Int],
                  empty: => DataFrame): DataFrame = {
    val dirs = bucketDirs(tableDir, readManifest(tableDir), buckets)
    if (dirs.isEmpty) empty else spark.read.parquet(dirs: _*)
  }

  /** Scan the full current snapshot (resolve the pointer once; the scan
    * cannot straddle a commit). */
  def readCurrent(spark: SparkSession, tableDir: String,
                  version: Option[Long] = None): DataFrame = {
    val m = readManifest(tableDir, version)
    val dirs = bucketDirs(tableDir, m, m.buckets.keys.toSeq)
    require(dirs.nonEmpty, s"bucketed table at $tableDir holds no data")
    spark.read.parquet(dirs: _*)
  }

  /** Commit a partial rewrite: `write(dir)` must land the FULL new content
    * of every bucket in `touched` under `dir` as `gbucket=B/` partition
    * directories (i.e. `df.write.mode("overwrite").partitionBy(BucketCol)`
    * with the [[bucketExpr]] column attached); every bucket NOT in
    * `touched` carries over by reference. Returns the committed version.
    *
    * A touched bucket for which `write` produced no directory is recorded
    * as rewritten-to-empty (its manifest entry points at the new version,
    * whose missing directory reads as zero rows). A crash before the
    * pointer rename leaves an unreferenced version directory — invisible
    * to readers, reclaimed by [[vacuum]]. */
  def commit(spark: SparkSession, tableDir: String, nBuckets: Int,
             touched: Seq[Int], write: String => Unit): Long = {
    require(touched.nonEmpty, "commit with no touched buckets is a no-op; skip it")
    require(touched.forall(b => b >= 0 && b < nBuckets),
      s"touched bucket out of range [0, $nBuckets): $touched")
    val prior: Option[Manifest] = if (exists(tableDir)) Some(readManifest(tableDir)) else None
    prior.foreach(m => require(m.nBuckets == nBuckets,
      s"bucket count is fixed at table creation: table has ${m.nBuckets}, caller passed $nBuckets"))
    // version claim + pointer commit are Warehouse's (one copy of the
    // atomic-create / ATOMIC_MOVE discipline for both manifest layers)
    val version = Warehouse.claimVersion(tableDir)
    write(s"$tableDir/v=$version")
    val next = prior.map(_.buckets).getOrElse(Map.empty) ++
      touched.map(_ -> version)
    val body = (s"nBuckets=$nBuckets" +:
      next.toSeq.sortBy(_._1).map { case (b, v) => s"$b $v" }).mkString("\n")
    Files.writeString(Paths.get(tableDir, s"v=$version", "_MANIFEST"), body)
    Warehouse.commitPointer(tableDir, version)
    version
  }

  /** Maintenance REBUCKET: materialize the entire current snapshot into one
    * fresh version, re-hashed onto `newNBuckets` buckets — the evolution a
    * growing dimension eventually needs (the bucket count is fixed per
    * commit so readers and writers agree on key placement, but bucket
    * BYTES grow with the table; when a bucket outgrows what one executor
    * comfortably holds, double the count here). With `newNBuckets` equal
    * to the current count this doubles as MANIFEST COMPACTION: afterwards
    * every bucket lives in the new version, so [[vacuum]] reclaims every
    * older directory and readers stop stitching across versions.
    *
    * Single-writer quiet-window contract (the [[Compaction]] posture):
    * pause the owning sink — a sink commit racing this rewrite would base
    * its manifest on whichever pointer rename lost and silently drop the
    * other's buckets. Returns the committed version. */
  def rebucket(spark: SparkSession, tableDir: String, keyCols: Seq[String],
               newNBuckets: Int): Long = {
    val snapshot = readCurrent(spark, tableDir)
      .withColumn(BucketCol, bucketExpr(keyCols, newNBuckets))
    val version = Warehouse.claimVersion(tableDir)
    snapshot.write.mode("overwrite").partitionBy(BucketCol)
      .parquet(s"$tableDir/v=$version")
    // every bucket maps to the fresh version (absent dirs read as empty)
    val body = (s"nBuckets=$newNBuckets" +:
      (0 until newNBuckets).map(b => s"$b $version")).mkString("\n")
    Files.writeString(Paths.get(tableDir, s"v=$version", "_MANIFEST"), body)
    Warehouse.commitPointer(tableDir, version)
    version
  }

  /** Drop every version directory the CURRENT manifest no longer references
    * (plus crashed `_CURRENT.tmp-*` pointers). Two protections compose:
    * unlike [[Warehouse.vacuum]], "older than current" alone is not enough
    * to doom a version — an old version stays live while any bucket's
    * manifest entry still points into it — AND (like Warehouse.vacuum)
    * versions NEWER than current always survive: one may be an in-flight
    * commit's freshly-claimed directory, which a concurrent vacuum must
    * not rip out from under the writer. Returns the dropped count. */
  def vacuum(tableDir: String): Int = {
    import scala.jdk.CollectionConverters._
    val cur = currentVersion(tableDir)
    val live: Set[Long] = readManifest(tableDir).buckets.values.toSet + cur
    val entries = {
      val s = Files.list(Paths.get(tableDir))
      try s.iterator().asScala.toSeq finally s.close()
    }
    // only STALE staged pointers (version <= current) are orphans; a newer
    // one may be a commitPointer mid-flight between its staging write and
    // the atomic rename — deleting it would fail that commit
    entries.filter { p =>
      val n = p.getFileName.toString
      n.startsWith("_CURRENT.tmp-") &&
        scala.util.Try(n.stripPrefix("_CURRENT.tmp-").toLong <= cur).getOrElse(true)
    }.foreach(Files.deleteIfExists(_))
    val doomed = entries.filter { p =>
      val n = p.getFileName.toString
      n.startsWith("v=") && {
        val v = n.stripPrefix("v=").toLong
        v < cur && !live.contains(v)
      }
    }
    doomed.foreach { d =>
      Files.walk(d).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
    doomed.size
  }
}
