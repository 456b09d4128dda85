package graft.io

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

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
}
