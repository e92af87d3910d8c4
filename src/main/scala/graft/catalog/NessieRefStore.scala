package graft.catalog

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** The REFERENCE PLANE of the Nessie-style catalog (round 11): named
  * refs (`branch <hash>` / `tag <hash>` lines) behind the four
  * primitives branch mutation actually needs — read, create-if-absent,
  * compare-and-set, delete-if. CAS on the head IS the commit protocol
  * (the public Nessie model); everything else in the catalog
  * (content-addressed commit objects) is immutable and needs no
  * coordination.
  *
  * Two implementations:
  *  - [[FileNessieRefStore]] — refs as files. CAS is serialized by a
  *    short-lived O_EXCL lock file: correct on file:// and
  *    HDFS-like filesystems, and documented as the weak point on
  *    object stores (no exclusive create on S3).
  *  - [[KvNessieRefStore]] — refs as conditional-write KV entries over
  *    the [[KvStore]] seam: `replace` (DynamoDB condition expression /
  *    ECS E-Tag If-Match) is NATIVE compare-and-set, so a production
  *    store rides DynamoDB/ECS semantics with no lock files and no
  *    stale-lock recovery on the commit path.
  */
private[catalog] trait NessieRefStore extends AutoCloseable {
  /** The ref's current line, or None when absent. Must never return a
    * torn/partial write. */
  def read(n: String): Option[String]
  /** Create iff absent; exactly one concurrent creator sees true. */
  def create(n: String, text: String): Boolean
  /** Compare-and-set: true iff the current line equals `expect` and is
    * now `text`. */
  def cas(n: String, expect: String, text: String): Boolean
  /** Delete iff the current line equals `expect`. */
  def deleteIf(n: String, expect: String): Boolean
  def listNames(): Seq[String]
  /** Cheap existence probe (no torn-read retry). */
  def exists(n: String): Boolean = read(n).isDefined
  /** True only before the default branch was ever bootstrapped. */
  def storeIsVirgin: Boolean = listNames().isEmpty
  /** Serialize a multi-ref read-modify-write that CAS alone cannot
    * express (the GC sweep). `names` are acquired in the given order —
    * callers sort, so two sweeps cannot deadlock. */
  def withExclusive[A](names: Seq[String])(body: => A): A
  override def close(): Unit = ()
}

/** Ref lines as files under `refsDir` — the original (round 10)
  * behavior, factored behind the seam: exclusive-create lock files
  * serialize CAS, atomic moves publish, readers retry the
  * delete→rename window on rename-no-overwrite filesystems. */
private[catalog] final class FileNessieRefStore(fs: FileSystem,
    refsDir: Path) extends NessieRefStore {

  private def refPath(n: String) = new Path(refsDir, n)

  // nio on file:// — never mix Hadoop-create/checksum machinery with
  // the nio-written refs (stale .crc sidecars); see NessieCatalog
  private def readText(p: Path): String =
    if (fs.getScheme == "file")
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p.toUri.getPath)), StandardCharsets.UTF_8)
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    }

  override def read(n: String): Option[String] = {
    val p = refPath(n)
    var attempts = 0
    while (true) {
      if (fs.exists(p)) {
        val text = try readText(p).trim
        catch { case _: java.io.IOException => "" }
        // a complete line has exactly "type hash"; anything else is a
        // torn read mid-publish — retry
        if (text.split(' ').length == 2) return Some(text)
        attempts += 1
        if (attempts > 50)
          throw new IllegalStateException(s"Malformed reference file: $p")
      } else {
        attempts += 1
        if (attempts > 50) return None
      }
      Thread.sleep(10)
    }
    sys.error("unreachable")
  }

  override def create(n: String, text: String): Boolean =
    try { atomicPublishFile(refPath(n), text + "\n", replaceExisting = false); true }
    catch { case _: java.io.IOException => false }

  override def cas(n: String, expect: String, text: String): Boolean =
    withLock(n) {
      if (!read(n).contains(expect)) false
      else { atomicPublishFile(refPath(n), text + "\n", replaceExisting = true); true }
    }

  override def deleteIf(n: String, expect: String): Boolean =
    withLock(n) {
      read(n).contains(expect) && fs.delete(refPath(n), false)
    }

  override def exists(n: String): Boolean = fs.exists(refPath(n))

  override def listNames(): Seq[String] =
    fs.listStatus(refsDir).toSeq.map(_.getPath.getName)
      // locks and crashed-publish temps live alongside the refs (dotted
      // names are reserved by createRef's name validation)
      .filterNot(nm => nm.endsWith(".lock") || nm.startsWith("."))
      .sorted

  /** The raw refs dir may hold only lock/tmp debris mid-publish; an
    * EMPTY dir is the only state that warrants bootstrapping main —
    * a name-filtered emptiness check could resurrect a branch whose
    * file is momentarily absent inside a delete→rename republish. */
  override def storeIsVirgin: Boolean = fs.listStatus(refsDir).isEmpty

  override def withExclusive[A](names: Seq[String])(body: => A): A =
    names match {
      case Seq() => body
      case n +: rest => withLock(n)(withExclusive(rest)(body))
    }

  // ----- lock + publish machinery (moved verbatim from round 10) -----

  /** Exclusive-create of the lock file. Hadoop's LocalFileSystem
    * `create(p, overwrite = false)` is check-then-act (two racers can
    * both "win"), so file:// stores go through java.nio's O_EXCL create;
    * HDFS-like schemes get atomic exclusive create from the NameNode. */
  private def tryAcquireLock(lock: Path): Boolean =
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(lock.toUri.getPath),
          s"${System.currentTimeMillis()}\n".getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch { case _: java.io.IOException => false }
    } else {
      try { writeExclusive(lock, s"${System.currentTimeMillis()}\n"); true }
      catch { case _: java.io.IOException => false }
    }

  private def deleteLock(lock: Path): Unit =
    if (fs.getScheme == "file")
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(lock.toUri.getPath))
    else fs.delete(lock, false)

  private def withLock[A](n: String)(body: => A): A = {
    val lock = refPath(s"$n.lock")
    val deadline = System.currentTimeMillis() + 30000
    var acquired = false
    while (!acquired) {
      if (tryAcquireLock(lock)) acquired = true
      else {
        // stale-lock recovery: a holder that crashed leaves its
        // timestamp behind; break locks older than 60 s (an unparsable
        // or in-flight lock is never stale)
        val stale = try {
          fs.exists(lock) &&
            readText(lock).trim.toLong < System.currentTimeMillis() - 60000
        } catch { case _: Exception => false }
        if (stale) deleteLock(lock)
        else if (System.currentTimeMillis() > deadline)
          throw new CommitConflictException(
            s"Timed out waiting for ref lock on $n")
        else Thread.sleep(5)
      }
    }
    try body finally deleteLock(lock)
  }

  private def writeExclusive(p: Path, text: String): Unit = {
    val out = fs.create(p, false)
    try out.write(text.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Write `text` to `p` so that `p` is NEVER observable half-written:
    * full write to a same-directory temp, then rename. file:// uses
    * java.nio ATOMIC_MOVE (with or without REPLACE_EXISTING); elsewhere
    * Hadoop rename (no overwrite — with `replaceExisting` the
    * destination is deleted first, opening the retry-covered window). */
  private def atomicPublishFile(p: Path, text: String,
      replaceExisting: Boolean): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}-${java.util.UUID.randomUUID()}.tmp")
    if (fs.getScheme == "file") {
      val src = java.nio.file.Paths.get(tmp.toUri.getPath)
      val dst = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.write(src, text.getBytes(StandardCharsets.UTF_8))
      if (replaceExisting)
        java.nio.file.Files.move(src, dst,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      else {
        // link(2): atomic AND fails on an existing destination — POSIX
        // rename (ATOMIC_MOVE without REPLACE) would silently replace
        try java.nio.file.Files.createLink(dst, src)
        catch {
          case e: java.nio.file.FileAlreadyExistsException =>
            throw new java.io.IOException(s"Destination exists: $p", e)
        } finally java.nio.file.Files.deleteIfExists(src)
      }
    } else {
      writeExclusive(tmp, text)
      if (replaceExisting) fs.delete(p, false)
      if (!fs.rename(tmp, p)) {
        fs.delete(tmp, false)
        throw new java.io.IOException(s"Failed to publish $p")
      }
    }
  }
}

/** Refs over the [[KvStore]] conditional-write seam: `refs/<name>`
  * entries whose CAS is the store's own `replace` — DynamoDB condition
  * expressions / ECS E-Tag writes carry the branch-head protocol with
  * no lock files at all on the commit path. `withExclusive` (GC only)
  * uses the standard DynamoDB lock-item pattern: `putIfAbsent` of a
  * timestamped lock key, stale-broken after 60 s. */
private[catalog] final class KvNessieRefStore(kv: KvStore, prefix: String,
    ownsStore: Boolean) extends NessieRefStore {

  private def key(n: String) = s"$prefix/refs/$n"
  private def lockKey(n: String) = s"$prefix/locks/$n"

  override def read(n: String): Option[String] = kv.get(key(n))
  override def create(n: String, text: String): Boolean =
    kv.putIfAbsent(key(n), text)
  override def cas(n: String, expect: String, text: String): Boolean =
    kv.replace(key(n), expect, text)
  override def deleteIf(n: String, expect: String): Boolean =
    kv.delete(key(n), Some(expect))
  override def listNames(): Seq[String] =
    kv.scanPrefix(s"$prefix/refs/").map(_._1.stripPrefix(s"$prefix/refs/"))

  override def withExclusive[A](names: Seq[String])(body: => A): A =
    names match {
      case Seq() => body
      case n +: rest =>
        val lk = lockKey(n)
        val deadline = System.currentTimeMillis() + 30000
        // unique per acquisition: release and stale-break are both
        // value-checked deletes, so a holder that stalled past the
        // stale window can never delete a SUCCESSOR's lock entry
        var myToken: String = null
        while (myToken == null) {
          val candidate = s"${System.currentTimeMillis()}:${java.util.UUID.randomUUID()}"
          if (kv.putIfAbsent(lk, candidate)) myToken = candidate
          else {
            val cur = kv.get(lk)
            val stale = cur.flatMap(_.split(':').headOption.flatMap(_.toLongOption))
              .exists(_ < System.currentTimeMillis() - 60000)
            if (stale) cur.foreach(v => kv.delete(lk, Some(v)))
            else if (System.currentTimeMillis() > deadline)
              throw new CommitConflictException(
                s"Timed out waiting for ref lock on $n")
            else Thread.sleep(5)
          }
        }
        try withExclusive(rest)(body)
        finally kv.delete(lk, Some(myToken))
    }

  override def close(): Unit = if (ownsStore) kv.close()
}
