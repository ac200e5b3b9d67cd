package graft.warehouse

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/** Advisory writer-exclusion lease for table maintenance.
  *
  * [[Warehouse.compact]] and [[Warehouse.updateSchema]] rewrite a
  * table through a snapshot-read → [[Warehouse.publishAtomic]] swap.
  * Concurrent READERS are covered by the documented retry protocol,
  * but a concurrent WRITER is not: rows appended between the snapshot
  * read and the final rename live only in the retired `.old` copy and
  * are destroyed when it is dropped. This lease closes that window
  * the simple way a plain-parquet warehouse can: maintenance holds
  * `<table>.lock` (created atomically, sibling of the table dir so
  * the publish renames never move it) for the duration of the
  * rewrite, and every append ([[graft.sink.IdempotentAppend
  * .atomicAppend]] — the single choke point all upsert paths go
  * through) refuses while the lock exists. The failed append is safe
  * to retry ([[Warehouse.retryWithBackoff]] is the house tool);
  * maintenance windows are seconds.
  *
  * Advisory means: the check-then-write race is not closed against a
  * writer that starts in the microseconds between the append's check
  * and its rename — closing that needs a catalog with real
  * transactions (Delta/Iceberg territory, same boundary as
  * publishAtomic's reader note). It turns the silent-destruction
  * scenario into an explicit, retryable error for every cooperating
  * writer.
  *
  * A crash inside maintenance leaves the lock behind by design — the
  * table state should be inspected (`.old` may hold the only copy)
  * before [[release]] is called manually. The lock file body records
  * the operation and epoch-millis for that triage. */
object MaintenanceLock {

  def lockPath(tablePath: String): Path =
    new Path(tablePath.stripSuffix("/") + ".lock")

  def isLocked(fs: FileSystem, tablePath: String): Boolean =
    fs.exists(lockPath(tablePath))

  /** Throw (with the lock's contents for triage) if maintenance holds
    * the table. Called by the append path before it publishes. */
  def assertUnlocked(fs: FileSystem, tablePath: String, op: String): Unit = {
    val p = lockPath(tablePath)
    if (fs.exists(p)) {
      val body =
        try {
          val in = fs.open(p)
          try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim
          finally in.close()
        } catch { case _: Exception => "<unreadable>" }
      throw new IllegalStateException(
        s"$op: table $tablePath is under maintenance ($body at ${p}); " +
          "retry after the maintenance completes (retryWithBackoff), or remove a " +
          "stale lock only after verifying no maintenance process is alive")
    }
  }

  /** Run `body` holding the table's maintenance lock. Releases on
    * SUCCESS only: a failed rewrite can leave `.old` as the table's
    * only complete copy, and releasing then would let appends run
    * against (and mkdir over) a broken table — the lock stays held so
    * every writer keeps refusing until the state is triaged, exactly
    * the crash story above. Fails fast if another maintenance holds
    * it. */
  def withLock[T](fs: FileSystem, tablePath: String, op: String)(body: => T): T = {
    val p = lockPath(tablePath)
    // create(..., overwrite = false) is the atomic claim: exactly one
    // of two racing maintenance processes wins the create.
    val out =
      try fs.create(p, false)
      catch {
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"$op: could not claim maintenance lock $p — another maintenance " +
              s"is running (or crashed leaving the lock; inspect, then remove): ${e.getMessage}")
      }
    try out.write(s"$op ${System.currentTimeMillis()}".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val result = body // a throw here keeps the lock — see scaladoc
    release(fs, tablePath)
    result
  }

  def release(fs: FileSystem, tablePath: String): Unit = {
    fs.delete(lockPath(tablePath), false)
    ()
  }

  /** What a held lock says, for triage: the operation that claimed it,
    * when (epoch millis, None for a body that does not parse), and the
    * raw body for display. */
  final case class LockStatus(op: String, claimedAtMs: Option[Long], raw: String) {
    def ageMs(nowMs: Long): Option[Long] = claimedAtMs.map(nowMs - _)
  }

  /** Read the lock without touching it: None when the table is not
    * under maintenance. The body is `"<op> <epochMillis>"` as written
    * by [[withLock]]; an unreadable or foreign body still reports,
    * with what it found, so triage never dead-ends. */
  def status(fs: FileSystem, tablePath: String): Option[LockStatus] = {
    val p = lockPath(tablePath)
    if (!fs.exists(p)) None
    else {
      val raw =
        try {
          val in = fs.open(p)
          try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim
          finally in.close()
        } catch { case _: Exception => "<unreadable>" }
      raw.split(' ') match {
        case parts if parts.length >= 2 && parts.last.forall(_.isDigit) && parts.last.nonEmpty =>
          Some(LockStatus(parts.init.mkString(" "), Some(parts.last.toLong), raw))
        case _ => Some(LockStatus(raw, None, raw))
      }
    }
  }
}
