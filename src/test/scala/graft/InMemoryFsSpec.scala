package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{BucketedTable, Compaction, Warehouse}

/** A complete NON-NIO [[GraftFs]] over an in-memory key map — the
  * demonstration that the r15 swap point is real: the engine's
  * control-plane protocols (Warehouse version claims + pointer commits,
  * Compaction generation resolution, the writer lease, Doctor's fsck) run
  * unchanged against a store that shares NOTHING with a filesystem —
  * including the `tryProcessLock = None` degrade path every plain object
  * store takes. Keys are `/`-separated strings; "directories" are implicit
  * prefixes plus explicit markers, exactly the object-store listing model. */
final class InMemoryFs extends GraftFs {
  private val files = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def norm(p: String): String = {
    val abs = java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString
    if (abs.length > 1 && abs.endsWith("/")) abs.dropRight(1) else abs
  }
  private def parentOf(p: String): Option[String] =
    Option(java.nio.file.Paths.get(p).getParent).map(_.toString)
  private def markParents(p: String): Unit =
    parentOf(p).foreach { d => dirs.add(d); markParents(d) }

  def exists(path: String): Boolean = {
    val p = norm(path)
    files.containsKey(p) || isDirectory(p)
  }
  def isDirectory(path: String): Boolean = {
    val p = norm(path)
    dirs.contains(p) || {
      val pre = p + "/"
      import scala.jdk.CollectionConverters._
      files.keySet.asScala.exists(_.startsWith(pre)) ||
        dirs.asScala.exists(_.startsWith(pre))
    }
  }
  def isFile(path: String): Boolean = files.containsKey(norm(path))

  def list(path: String): Seq[String] = {
    val p = norm(path)
    if (!isDirectory(p)) return Nil
    val pre = p + "/"
    import scala.jdk.CollectionConverters._
    (files.keySet.asScala ++ dirs.asScala).toSeq
      .filter(_.startsWith(pre))
      .map(k => pre + k.stripPrefix(pre).takeWhile(_ != '/'))
      .distinct.sorted
  }
  def walk(path: String): Seq[String] = {
    val p = norm(path)
    if (!exists(p)) return Nil
    val pre = p + "/"
    import scala.jdk.CollectionConverters._
    val kids = (files.keySet.asScala ++ dirs.asScala).toSeq
      .filter(_.startsWith(pre))
      // include every intermediate implicit dir, like Files.walk does
      .flatMap { k =>
        val rel = k.stripPrefix(pre).split("/")
        rel.inits.toSeq.filter(_.nonEmpty).map(seg => pre + seg.mkString("/"))
      }
    (p +: kids).distinct.sorted
  }

  def readString(path: String): String = new String(readBytes(path), "UTF-8")
  def readBytes(path: String): Array[Byte] = {
    val b = files.get(norm(path))
    if (b == null) throw new java.nio.file.NoSuchFileException(path)
    b.clone()
  }
  def readLines(path: String): Seq[String] =
    readString(path).split("\n", -1).toSeq

  def writeString(path: String, content: String): Unit =
    writeBytes(path, content.getBytes("UTF-8"))
  def writeBytes(path: String, content: Array[Byte]): Unit = {
    val p = norm(path)
    markParents(p); files.put(p, content.clone())
  }

  def createDirectories(path: String): Unit = {
    val p = norm(path); dirs.add(p); markParents(p)
  }
  def createDirectoryClaim(path: String): Boolean = {
    val p = norm(path)
    if (files.containsKey(p) || isDirectory(p)) false
    else { markParents(p); dirs.add(p) }
  }
  def atomicReplace(src: String, dst: String): Unit = {
    val s = norm(src); val d = norm(dst)
    val b = files.remove(s)
    if (b == null) throw new java.nio.file.NoSuchFileException(src)
    markParents(d); files.put(d, b)
  }
  def moveIfAbsent(src: String, dst: String): Unit = {
    val s = norm(src); val d = norm(dst)
    if (exists(d)) throw new java.nio.file.FileAlreadyExistsException(dst)
    if (!exists(s)) throw new java.nio.file.NoSuchFileException(src)
    import scala.jdk.CollectionConverters._
    markParents(d)
    if (files.containsKey(s)) files.put(d, files.remove(s))
    else {
      val pre = s + "/"
      files.keySet.asScala.toSeq.filter(_.startsWith(pre))
        .foreach(k => files.put(d + "/" + k.stripPrefix(pre), files.remove(k)))
      dirs.asScala.toSeq.filter(k => k == s || k.startsWith(pre)).foreach { k =>
        dirs.remove(k)
        dirs.add(if (k == s) d else d + "/" + k.stripPrefix(pre))
      }
    }
  }
  def deleteIfExists(path: String): Unit = {
    val p = norm(path); files.remove(p); dirs.remove(p)
  }
  def deleteRecursively(path: String): Unit = {
    val p = norm(path)
    import scala.jdk.CollectionConverters._
    val pre = p + "/"
    files.keySet.asScala.toSeq.filter(k => k == p || k.startsWith(pre))
      .foreach(files.remove)
    dirs.asScala.toSeq.filter(k => k == p || k.startsWith(pre))
      .foreach(dirs.remove)
  }
  def copy(src: String, dst: String): Unit = writeBytes(dst, readBytes(src))
  def size(path: String): Long = readBytes(path).length.toLong
  def lastModifiedMillis(path: String): Long = 0L
  def openRead(path: String): java.io.InputStream =
    new java.io.ByteArrayInputStream(readBytes(path))
  def openWrite(path: String): java.io.OutputStream =
    new java.io.ByteArrayOutputStream() {
      override def close(): Unit =
        { super.close(); InMemoryFs.this.writeBytes(path, toByteArray) }
    }
  /** Plain object stores have no advisory locks — the degrade path. */
  def tryProcessLock(path: String): Option[AutoCloseable] = None

  /** EXACT conditional PUT (r15 judge #2) — the primitive a real object
    * store exposes as If-Match / If-None-Match: atomic on the backing
    * `ConcurrentHashMap`, so exactly one of N same-instant racers with the
    * same `expected` wins. */
  override def replaceIfMatch(path: String, expected: Option[String],
                              next: String): Option[Boolean] = {
    val pth = norm(path)
    val nb = next.getBytes("UTF-8")
    expected match {
      case None =>
        val prev = files.putIfAbsent(pth, nb)
        if (prev == null) { markParents(pth); Some(true) } else Some(false)
      case Some(e) =>
        val eb = e.getBytes("UTF-8")
        // replace(k, old, new) compares arrays by identity — use the
        // atomic computeIfPresent form with an explicit content compare
        var won = false
        files.computeIfPresent(pth, (_, cur) =>
          if (java.util.Arrays.equals(cur, eb)) { won = true; nb } else cur)
        Some(won)
    }
  }
}

class InMemoryFsSpec extends AnyFunSuite {

  private def withFs[T](body: InMemoryFs => T): T = {
    val fs = new InMemoryFs
    val prev = GraftFs.default
    GraftFs.default = fs
    try body(fs) finally GraftFs.default = prev
  }

  test("Warehouse pointer protocol runs unchanged on a non-NIO store: claim CAS, commit, current, vacuum") {
    withFs { fs =>
      val t = "/mem/warehouse/t"
      val spark = TestSpark.spark // unused by the write callback below
      val v1 = Warehouse.publish(spark, t,
        dir => fs.writeString(s"$dir/part-0", "gen1"), fs)
      assert(v1 === 1L)
      assert(Warehouse.currentVersion(t, fs) === 1L)
      val v2 = Warehouse.publish(spark, t,
        dir => fs.writeString(s"$dir/part-0", "gen2"), fs)
      assert(v2 === 2L, "version claim is monotone through the in-memory CAS")
      assert(Warehouse.currentVersion(t, fs) === 2L)
      // a crashed publish's stale staged pointer is vacuumed; v=1 dropped
      fs.writeString(s"$t/_CURRENT.tmp-1", "1")
      assert(Warehouse.vacuum(t, fs) === 1)
      assert(!fs.exists(s"$t/v=1") && !fs.exists(s"$t/_CURRENT.tmp-1"))
      assert(fs.readString(s"$t/v=2/part-0") === "gen2")
    }
  }

  test("Compaction generation resolution + legacy crash heal run unchanged on a non-NIO store") {
    withFs { fs =>
      val t = "/mem/idx/postings"
      fs.writeString(s"$t/part-0.parquet", "gen0")
      assert(Compaction.currentPath(t, fs) === t, "no pointer = flat generation 0")
      assert(Compaction.tableExists(t, fs))
      // a published generation resolves through the pointer
      fs.writeString(s"$t.v3/part-0.parquet", "gen3")
      fs.writeString(s"$t._CURRENT", "3")
      assert(Compaction.currentVersion(t, fs) === 3L)
      assert(Compaction.currentPath(t, fs) === s"$t.v3")
      // legacy rename-swap crash: no flat tree, no pointer, an .old- copy
      val u = "/mem/idx2/postings"
      fs.writeString(s"$u.old-123/part-0.parquet", "whole")
      assert(Compaction.recoverInterrupted(u, fs),
        "the retired tree is restored whole on the in-memory store")
      assert(fs.readString(s"$u/part-0.parquet") === "whole")
      assert(Compaction.tableExists(u, fs))
    }
  }

  test("writer lease acquire/steal/fence logic runs on a store with NO advisory locks at all") {
    withFs { fs =>
      val t = "/mem/dim"
      val a = BucketedTable.acquireWriterLease(t, "host-a", ttlMillis = 0L)
      val b = BucketedTable.acquireWriterLease(t, "host-b")
      assert(b.epoch === a.epoch + 1)
      val blocked = intercept[java.util.ConcurrentModificationException] {
        BucketedTable.acquireWriterLease(t, "host-c")
      }
      assert(blocked.getMessage.contains("host-b"))
      BucketedTable.releaseWriterLease(b)
      val c = BucketedTable.acquireWriterLease(t, "host-c")
      assert(c.epoch === b.epoch + 1, "epoch survives release (expire-in-place)")
    }
  }

  test("replaceIfMatch is an EXACT conditional PUT on the in-memory store") {
    withFs { fs =>
      val f = "/mem/cas/lease"
      assert(fs.replaceIfMatch(f, None, "a") === Some(true))
      assert(fs.replaceIfMatch(f, None, "b") === Some(false))
      assert(fs.replaceIfMatch(f, Some("a"), "c") === Some(true))
      assert(fs.replaceIfMatch(f, Some("a"), "d") === Some(false),
        "stale expectation loses without clobbering")
      assert(fs.readString(f) === "c")
      // exactly one of N same-instant racers wins on the map-level CAS
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val wins = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = {
            gate.await()
            fs.replaceIfMatch(f, Some("c"), s"w$i").contains(true)
          }
        })
      }
      gate.countDown()
      assert(wins.map(_.get()).count(identity) === 1)
      pool.shutdown()
    }
  }

  test("lease acquisition on the no-advisory-lock store is exactly-one-wins via conditional PUT") {
    withFs { _ =>
      val t = "/mem/dim_cas"
      val seed = BucketedTable.acquireWriterLease(t, "seed", ttlMillis = 0L)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val tries = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Option[Long]] {
          def call(): Option[Long] = {
            gate.await()
            try Some(BucketedTable.acquireWriterLease(t, s"racer-$i").epoch)
            catch { case _: java.util.ConcurrentModificationException => None }
          }
        })
      }
      gate.countDown()
      val outcomes = tries.map(_.get())
      pool.shutdown()
      assert(outcomes.flatten.size === 1,
        s"exactly one racer acquires even with tryProcessLock = None: $outcomes")
      assert(outcomes.flatten.head === seed.epoch + 1)
    }
  }

  test("a corrupt _WRITER_LEASE raises for operator intervention instead of resetting the epoch (r15 ADVICE)") {
    withFs { fs =>
      val t = "/mem/dim_corrupt"
      BucketedTable.acquireWriterLease(t, "owner", ttlMillis = 0L)
      fs.writeString(s"$t/_WRITER_LEASE", "not a lease at all")
      val e = intercept[IllegalStateException] {
        BucketedTable.acquireWriterLease(t, "next")
      }
      assert(e.getMessage.contains("does not parse"))
      assert(e.getMessage.contains("epoch"),
        "the message explains the epoch-reset hazard")
    }
  }

  test("release CASes against what it read: a new owner's lease is never clobbered") {
    withFs { fs =>
      val t = "/mem/dim_rel"
      val a = BucketedTable.acquireWriterLease(t, "host-a", ttlMillis = 0L)
      // host-b takes over after a's lease expired
      val b = BucketedTable.acquireWriterLease(t, "host-b")
      // a's late release must leave b's lease intact (readLease check) —
      // and the CAS path guarantees it even if the check raced
      BucketedTable.releaseWriterLease(a)
      assert(fs.readString(s"$t/_WRITER_LEASE").startsWith(s"host-b ${b.epoch} "))
    }
  }

  test("conditional pointer flip: a moved pointer loses LOUDLY at the flip on a no-lock store (r16)") {
    withFs { fs =>
      val ptr = "/mem/casptr/_CURRENT"
      // table-creating commit: If-None-Match create
      Warehouse.commitPointerCas(ptr, 1, None, fs)
      assert(fs.readString(ptr) === "1")
      // ordinary flip against the bytes the parent check read
      Warehouse.commitPointerCas(ptr, 2, Some("1"), fs)
      assert(fs.readString(ptr) === "2")
      // a racer moved the pointer after our check: the flip itself raises,
      // BEFORE clobbering — previously (plain rename) the clobber happened
      // and only the post-commit chain check could notice
      val lost = intercept[java.util.ConcurrentModificationException] {
        Warehouse.commitPointerCas(ptr, 9, Some("1"), fs)
      }
      assert(lost.getMessage.contains("conditional pointer flip lost"))
      assert(fs.readString(ptr) === "2", "the loser must not clobber")
      // a second table-creating commit racing the first loses the same way
      intercept[java.util.ConcurrentModificationException] {
        Warehouse.commitPointerCas(ptr, 1, None, fs)
      }
    }
  }

  test("Doctor fscks a synthetic in-memory tree: healthy clean, broken pointer named") {
    withFs { fs =>
      val root = "/mem/doctor"
      fs.writeString(s"$root/w/v=1/part-0.parquet", "d")
      fs.writeString(s"$root/w/_CURRENT", "1")
      assert(Doctor.diagnose(root, fs = fs).isEmpty, "healthy tree is clean")
      fs.writeString(s"$root/w/_CURRENT", "9")
      val f = Doctor.diagnose(root, fs = fs).filter(_.level == "FAIL")
      assert(f.nonEmpty && f.head.layer === "pointer-table")
      assert(f.head.problem.contains("v=9"))
    }
  }
}
