package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

/** Pluggable `_COMMITTED` publication primitive for
  * [[Layout.commitGeneration]] — the last step of the staged-
  * generation protocol, made injectable for stores WITHOUT atomic
  * rename (bare S3A): there the fence-to-destroy windows widen from
  * instants to the copy duration, and the one defense left is making
  * the PUBLICATION itself conditional — an S3 conditional-put
  * (`If-None-Match` + a fence-token tag), a DynamoDB/etcd CAS row,
  * whatever the deployment's store offers. The engine hands the
  * implementation everything the condition needs: the marker path,
  * the index root, and the fence token this writer committed under.
  *
  * Selected per session via `graft.index.commitMarkerFactory` (the
  * fully-qualified class name of a no-arg-constructible
  * implementation); unset = [[CreateCommitMarker]], the plain
  * create-if-absent the atomic-rename stores get. A `false` return
  * REFUSES publication: commitGeneration then aborts exactly like a
  * fence abort — the fully-renamed generation stays unpublished
  * (invisible to every reader) and the GC sweeps reclaim it. */
trait CommitMarker {

  /** Publish `marker`, conditioned on the mutation lease of
    * `indexDir` still carrying `expectedToken` at publication time
    * (None = a legacy caller mutating without the lease — publish
    * unconditionally; such callers have no fence to condition on).
    * Return false to refuse. Implementations must make the
    * condition-and-create as atomic as their store allows — that
    * atomicity is the entire point of injecting one. */
  def publish(fs: FileSystem, marker: Path, indexDir: String,
      expectedToken: Option[String]): Boolean
}

/** The default publisher: one create-IF-ABSENT. Correct wherever
  * rename is atomic (HDFS, local, ABFS, GCS) — there the residual
  * window is the instant between the second fence re-read and this
  * create, unreachable without a takeover interleaved inside the
  * commit sequence (LeaseSpec pins the worst case as benign). A
  * pre-existing marker is protocol-unreachable (the generation dir is
  * staged token-unique and renamed exactly once, and commitGeneration
  * deletes a leftover finally-named dir before its rename), so
  * `overwrite = false` costs nothing and turns "can't happen" into a
  * loud `FileAlreadyExistsException` instead of a silent re-publish.
  * The marker CONTENT is the fence token this writer committed under
  * (empty for lease-less legacy callers) — post-mortem attribution of
  * WHICH writer published a generation comes free with the create. */
final class CreateCommitMarker extends CommitMarker {
  override def publish(fs: FileSystem, marker: Path, indexDir: String,
      expectedToken: Option[String]): Boolean = {
    val out = fs.create(marker, false)
    try out.write(expectedToken.getOrElse("")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    true
  }
}
