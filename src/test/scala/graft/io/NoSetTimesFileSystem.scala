package graft.io

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** A local filesystem whose `setTimes` is a SILENT NO-OP — the
  * object-store FileSystem behavior (S3A and friends commonly ignore
  * or reject mtime updates) that would starve an mtime-touch lease
  * heartbeat: the lock's mtime never moves after creation, so a
  * live multi-hour mutation looks crashed after `leaseStaleMs` and
  * becomes takeover bait. LeaseSpec registers it under the `nost://`
  * scheme (`fs.nost.impl`) and pins that [[Layout]]'s heartbeat
  * PROBES the capability and falls back to the `_mutation.lock.hb`
  * sidecar, keeping a live holder fresh while a crashed one still
  * goes stale by wall clock. */
class NoSetTimesFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "nost"
  override def getUri: URI = URI.create("nost:///")
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit = ()

  /** RawLocalFileSystem's statuses load permissions LAZILY via
    * `new java.io.File(path.toUri)`, which rejects any scheme but
    * `file` — fine on real stores, fatal under a foreign test
    * scheme the moment something wraps a status into
    * LocatedFileStatus (FileSystem.listFiles does). Materialize
    * plain statuses with default permissions instead; nothing in the
    * engine reads permissions. */
  private def strip(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      null, null, null, st.getPath)

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(strip)

  override def getFileStatus(f: Path): FileStatus =
    strip(super.getFileStatus(f))
}
