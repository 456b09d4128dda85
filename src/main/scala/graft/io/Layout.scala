package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Physical-layout helpers for the warehouse side of the engine: at
  * 100 TB the cheapest shuffle is the one the table layout already
  * paid for. Bucketed tables co-locate equal join keys, so repeated
  * joins/aggregations on the bucket key read pre-partitioned data and
  * plan no Exchange (LayoutSpec asserts this on the physical plan).
  *
  * Partition columns (coarse, low-cardinality — e.g. repo_name or an
  * ingest date) prune whole directories at scan time; bucket columns
  * (fine, high-cardinality join keys — custkey, doc_id) kill the
  * shuffle. The two compose.
  *
  * All filesystem operations here resolve through Hadoop's
  * `FileSystem` from the session's configuration — the same
  * resolution the parquet reads/writes use — so URI-schemed paths
  * (hdfs://, s3a://) behave exactly like local ones. `java.io.File`
  * probes silently report "absent" for such paths, which is how a
  * stored-index maintenance path stops firing with no error.
  */
object Layout {

  /** Write df as a bucketed (and optionally sorted-in-bucket) managed
    * table. Joins/aggs on `bucketKeys` against tables bucketed the
    * same way are exchange-free. */
  def writeBucketed(df: DataFrame, table: String, bucketKeys: Seq[String],
      numBuckets: Int, partitionCols: Seq[String] = Nil): Unit = {
    var w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketKeys.head, bucketKeys.tail: _*)
      .sortBy(bucketKeys.head, bucketKeys.tail: _*)
    if (partitionCols.nonEmpty)
      w = w.partitionBy(partitionCols: _*)
    w.saveAsTable(table)
  }

  /** Existence probe through the session's Hadoop FileSystem — the
    * only correct way to ask "does this artifact exist" for a path
    * the engine also reads/writes as parquet. */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Effectively-once guard for foreachBatch index MAINTENANCE:
    * Structured Streaming's foreachBatch is AT-LEAST-ONCE — a crash
    * between sink work and checkpoint commit re-delivers the same
    * (batchId, rows) on restart. An idempotent body (tombstone
    * deletes) shrugs replay off; an APPEND body would double-insert,
    * so it runs under the canonical batch-commit-log defense: skip if
    * `<dir>/_batch_commits/<id>` exists, else run the body and touch
    * the marker AFTER it completes. Returns whether the body ran.
    * The residual window — body finished, crash before the marker —
    * re-runs the body once on replay. NOTHING in the engine uses
    * this guard anymore: both index families' refresh streams commit
    * through the staged-segment manifest protocol (see
    * [[graft.ops.FullText.appendToTextIndex]] /
    * [[graft.queries.SimilarityQueries.appendToIvfPqIndex]]), where
    * the batch's segment id in the applied-segments registry IS the
    * commit record, with no residual window. Kept as the generic
    * defense for EXTERNAL foreachBatch bodies that write unversioned
    * targets. Markers accumulate one EMPTY file per micro-batch;
    * they are metadata of the stream, dropped whenever the index is
    * rebuilt. */
  def onceForBatch(spark: SparkSession, indexDir: String,
      batchId: Long)(body: => Unit): Boolean = {
    val marker = new Path(s"$indexDir/_batch_commits/$batchId")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) false
    else {
      body
      fs.create(marker, true).close()
      true
    }
  }

  /** Generation COMMIT POINTS for stored-index layouts — the Lucene
    * `segments_N` model: artifacts that must move TOGETHER under a
    * mutation (a text index's dictionary + statistics + tombstones
    * under a delete) live in `<indexDir>/gen-N/` directories, and a
    * generation becomes visible only when its `_COMMITTED` marker
    * lands (one atomic file create). A writer stages gen N+1 fully —
    * any crash before the marker leaves an INVISIBLE partial dir and
    * the previous generation intact and mutually consistent — then
    * commits. Readers resolve the highest committed generation.
    * Returns None when no committed generation exists (a legacy /
    * never-deleted index keeps its artifacts at the root).
    *
    * SINGLE MUTATOR AT A TIME — the Lucene IndexWriter contract:
    * concurrent mutations of one index race on the gen-(N+1) staging
    * directory (each starts by clearing it) and are NOT supported.
    * Readers are unaffected (they see only committed generations); a
    * deployment feeding one index from several streams unions the
    * feeds into one stream, or serializes mutations through one
    * maintenance queue, exactly as it would with Lucene/ES shard
    * writers. */
  def liveGeneration(spark: SparkSession, indexDir: String): Option[Long] = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val gens = fs.listStatus(p).iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.startsWith("gen-") && n.length > 4 &&
        n.drop(4).forall(_.isDigit))
      .map(_.drop(4).toLong)
      .filter(g => fs.exists(new Path(s"${generationDir(indexDir, g)}/_COMMITTED")))
      .toSeq
    if (gens.isEmpty) None else Some(gens.max)
  }

  def generationDir(indexDir: String, gen: Long): String =
    s"$indexDir/gen-$gen"

  /** The single-file-create commit of a fully staged generation. */
  def commitGeneration(spark: SparkSession, genDir: String): Unit = {
    val marker = new Path(s"$genDir/_COMMITTED")
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(marker, true).close()
  }

  /** Reclaim generations superseded by `keep` — run AFTER a
    * successful commit. By default only the just-committed generation
    * survives; a deployment wanting LOCK-FREE READERS (a query planned
    * over gen-N must not lose its artifacts when gen-N+1 commits
    * mid-plan) sets `graft.index.retainGenerations` in the session
    * conf to K > 1 and the K newest generations below `keep` are
    * retained (segment GC honors their manifests too). Uncommitted
    * stragglers ABOVE `keep` (crashed writers) always drop. Compaction
    * remains a maintenance-window operation regardless — it
    * physically reclaims data directories older generations may
    * reference. */
  def dropSupersededGenerations(spark: SparkSession, indexDir: String,
      keep: Long): Unit = {
    val retain = spark.conf
      .get("graft.index.retainGenerations", "1").toInt.max(1)
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith("gen-") && n.length > 4 &&
          n.drop(4).forall(_.isDigit)) {
        val g = n.drop(4).toLong
        if (g > keep || g <= keep - retain)
          fs.delete(st.getPath, true)
      }
    }
  }

  /** The committed generation numbers currently on disk, ascending —
    * more than one only under `graft.index.retainGenerations` > 1. */
  def committedGenerations(spark: SparkSession,
      indexDir: String): Seq[Long] = {
    val p = new Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => n.startsWith("gen-") && n.length > 4 &&
        n.drop(4).forall(_.isDigit))
      .map(_.drop(4).toLong)
      .filter(g => fs.exists(new Path(s"${generationDir(indexDir, g)}/_COMMITTED")))
      .toSeq.sorted
  }

  /** The shared commit epilogue of every staged-generation mutation:
    * ONE marker makes the staged artifact set live, superseded
    * generations retire (honoring the retain knob), and a legacy
    * FLAT tombstone set at the root — now shadowed by the committed
    * generation — is reclaimed. */
  def commitGenerationAndRetire(spark: SparkSession, indexDir: String,
      stage: String, gen: Long, previousArt: String): Unit = {
    commitGeneration(spark, stage)
    dropSupersededGenerations(spark, indexDir, keep = gen)
    if (previousArt == indexDir) {
      val t = new Path(s"$indexDir/tombstones")
      t.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(t, true)
    }
  }

  /** Distributed rewrite of a stored index's TOMBSTONE artifact —
    * the one artifact whose size is bounded only by
    * deletes-since-compaction, which a takedown backlog (a GDPR
    * sweep, a dedup-losers purge of 30% of a corpus) makes
    * corpus-scale. The frame therefore writes DISTRIBUTED: below
    * `graft.index.tombstoneSingleFileMax` rows (default 2M) it
    * packs into one sorted file — the stable small-set layout every
    * reader point-loads cheaply — and above it the partitioning of
    * the union writes through unchanged, so a billion-row tombstone
    * set never funnels through one task (and never through the
    * driver: callers build `frame` from anti-joins and unions, not
    * collected Sets). */
  def writeTombstoneArtifact(spark: SparkSession, frame: DataFrame,
      path: String, totalRows: Long): Unit = {
    val max = spark.conf
      .get("graft.index.tombstoneSingleFileMax", "2000000").toLong
    val out =
      if (totalRows <= max)
        frame.coalesce(1).sortWithinPartitions(frame.columns.head)
      else frame
    out.write.parquet(path)
  }

  /** Swap-safe overwrite of a parquet artifact whose REPLACEMENT is
    * computed FROM its current content (a dictionary merge, a
    * statistics decrement): `mode("overwrite")` on the path a plan is
    * lazily reading deletes the input mid-scan, so the new frame
    * lands in `<path>.new` first and directory renames make it live.
    * Crash before the first rename leaves the live artifact
    * untouched; crash between renames leaves a `<path>.old` to
    * restore (the compactBandIndex rotation). */
  def rewriteParquet(spark: SparkSession, frame: DataFrame, path: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".new")
    val old = new Path(path + ".old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    var w = frame.write.mode("overwrite")
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.parquet(tmp.toString)
    if (fs.exists(p))
      require(fs.rename(p, old), s"swap: $path -> .old failed")
    require(fs.rename(tmp, p), s"swap: .new -> $path failed")
    fs.delete(old, true)
  }

  /** In-place small-file compaction of a parquet directory — every
    * `append` (a stored-index delta, a streaming micro-batch) lands
    * new part-files, and a partitioned layout accumulates them PER
    * PARTITION VALUE, degrading exactly the file-pruned scans the
    * layout exists for. Rewrites the directory with rows clustered by
    * `partitionCols` (one task per hash bucket → one file per
    * partition value) and swaps directories keep-the-old-until-live
    * (the compactBandIndex rotation: crash before the swap leaves the
    * live dir untouched; crash between renames leaves a `.old` to
    * restore). Run in a maintenance window; online compaction wants a
    * transactional table format.
    *
    * `minus` applies a TOMBSTONE set during the rewrite: rows whose
    * `minus` key columns match a tombstone row are dropped — the
    * physical half of the stored layouts' delete contract (search
    * faces anti-join the live tombstones; compaction reclaims them).
    * The tombstone frame broadcasts: it is delete-batch-sized by
    * contract, and compaction is exactly the mechanism that keeps it
    * so. Without `minus`, content is untouched — appends are NEW rows
    * here, not replays, so there is nothing to dedup, and callers'
    * spec gates pin frame equality across the rewrite.
    *
    * Returns (dataFilesBefore, dataFilesAfter, rows) — the
    * reclaimed-file observable the layout specs pin. */
  def compactParquetDir(spark: SparkSession, path: String,
      partitionCols: Seq[String] = Nil,
      minus: Option[(DataFrame, Seq[String])] = None): (Long, Long, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(d: Path): Long = {
      if (!fs.exists(d)) return 0L
      var n = 0L
      val it = fs.listFiles(d, true)
      while (it.hasNext)
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    if (!fs.exists(p)) return (0L, 0L, 0L)
    val before = dataFiles(p)
    val df0 = spark.read.parquet(path)
    val df1 = minus match {
      case Some((tomb, keys)) =>
        df0.join(broadcast(tomb.select(keys.map(col): _*).distinct()),
          keys, "left_anti")
      case None => df0
    }
    // partitioned: cluster rows so each partition value writes one
    // file. Unpartitioned: the SCAN already packs small files into
    // few splits (openCostInBytes file packing), so the plain rewrite
    // shrinks the file count without a coalesce(1) single-thread trap.
    val df = if (partitionCols.nonEmpty)
      df1.repartition(partitionCols.map(col): _*) else df1
    val tmp = new Path(path + ".compact")
    val old = new Path(path + ".old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    var w = df.write.mode("overwrite")
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.parquet(tmp.toString)
    val rows = spark.read.parquet(tmp.toString).count()
    require(fs.rename(p, old), s"swap: $path -> .old failed")
    require(fs.rename(tmp, p), s"swap: .compact -> $path failed")
    fs.delete(old, true)
    (before, dataFiles(p), rows)
  }
}
