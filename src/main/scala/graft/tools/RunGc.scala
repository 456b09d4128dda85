package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.io.Layout

/** Staging GC CLI — the reclamation face for orphaned staging that
  * the normal retire sweep never reaches: token-suffixed
  * `gen-N.<token>` / side directories (a writer that crashed or was
  * fenced out mid-stage) and unmarked `gen-N` dirs above the live
  * generation (a pre-token-staging crash). Those are invisible to
  * every reader by construction, but [[graft.io.Layout
  * .dropSupersededGenerations]] runs only AFTER a committed mutation
  * — an index that crashes and then goes idle leaks them forever,
  * and `RunStatus` now reports exactly that leak
  * (`orphaned_staging`). This tool reclaims it WITHOUT folding:
  * no corpus read, no new generation — the committed state (and
  * every search page) is bit-identical before and after.
  *
  * Usage: RunGc <indexDir> [--wait <sec>]
  *
  * Runs under the mutation lease (single-writer contract: a zombie
  * whose staging we are deleting is fenced by construction — if it
  * is somehow still alive its commit aborts at the fence re-read,
  * and deleting its staging is precisely this tool's job). `--wait`
  * polls the acquisition like RunCompact/RunTakedown. Safe to re-run
  * (an empty sweep deletes nothing). Prints one JSON line with the
  * reclaimed dir count and bytes. */
object RunGc {

  /** Separated from main for RunGcSpec: reclaim orphaned staging and
    * sweep rotation leftovers under the lease, returning
    * (dirsReclaimed, bytesReclaimed, rotationsHealed). The rotation
    * sweep covers the swap-rotation crash states the staging listing
    * doesn't: any base with a `.old` backup heals through
    * [[graft.io.Layout.healSwapRotation]] (missing base restores or
    * rolls forward; an AMBIGUOUS copy-rename crash state — base +
    * `.old` + staging all present — is REPORTED and left untouched,
    * never guessed at); what the heal leaves behind (`.old` beside a
    * live base, `.new`/`.compact` staging with no backup) is garbage
    * and reclaims. Manifest-referenced names are excluded like
    * everywhere else (STRICT: a manifest read failure aborts the
    * sweep — this set is the only guard on deletion). Safe under the
    * lease for every ENGINE mutator (all rotations run inside
    * withMutationLease); legacy direct callers that rotate without
    * the lease are covered by the `graft.index.gcRotationGraceMs`
    * mtime grace window (default 15 min, 0 = sweep everything) —
    * rotation dirs younger than the grace are skipped this run.
    * Returns (dirsReclaimed, bytesReclaimed, rotationsHealed,
    * ambiguousRotations). */
  def run(spark: SparkSession, indexDir: String,
      waitSec: Option[Long] = None): (Int, Long, Int, Int) =
    Layout.withLeaseWait(spark, waitSec) {
      Layout.withMutationLease(spark, indexDir) {
        val orphans = Layout.orphanedStaging(spark, indexDir,
          underLease = true)
        val p = new Path(indexDir)
        val fs = p.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        // count an orphan reclaimed only when the delete SUCCEEDS —
        // a false return (permission, transient store error) must
        // not inflate the reported reclamation
        var reclaimed = 0
        var reclaimedBytes = 0L
        orphans.foreach { case (name, bytes) =>
          if (fs.delete(new Path(p, name), true)) {
            reclaimed += 1
            reclaimedBytes += bytes
          }
        }
        var healed = 0
        val rotSuffixes = Seq(".old", ".new", ".compact")
        // strict: this set is the ONLY thing keeping the sweep off
        // manifest-referenced segment dirs whose caller-chosen names
        // end in a rotation suffix — a manifest read failure aborts
        // here rather than proceed with an empty exclusion
        val referenced =
          Layout.manifestReferenced(spark, indexDir, strict = true)
        // grace window: every ENGINE rotation runs under the lease we
        // hold, so none can be in flight — but fenceHeldLease admits
        // legacy direct callers that rotate WITHOUT the lease, and
        // sweeping their seconds-old staging would abort their
        // rotation mid-flight. Rotation dirs younger than the grace
        // are skipped (crashed leftovers are hours old by the time an
        // operator runs GC; the next run picks up anything skipped).
        val graceMs = spark.conf
          .getOption("graft.index.gcRotationGraceMs")
          .map(_.toLong).getOrElse(15L * 60 * 1000)
        val now = System.currentTimeMillis()
        val entries = fs.listStatus(p).filter(st => st.isDirectory &&
          rotSuffixes.exists(st.getPath.getName.endsWith(_)))
        def sweepable(
            st: org.apache.hadoop.fs.FileStatus): Boolean = {
          val n = st.getPath.getName
          !referenced.contains(n) &&
            now - st.getModificationTime >= graceMs
        }
        // PASS 1 — heal: every base with a `.old` backup goes through
        // the one heal (restore, roll-forward, or the AMBIGUOUS
        // throw). Ambiguous bases are remembered so pass 2 cannot
        // reclaim the very artifacts an operator needs to resolve.
        val ambiguousBases = scala.collection.mutable.Set[String]()
        entries.foreach { st =>
          val n = st.getPath.getName
          if (n.endsWith(".old") && n.length > 4 && sweepable(st)) {
            val base = n.dropRight(4)
            try {
              if (Layout.healSwapRotation(spark,
                  new Path(p, base).toString)) healed += 1
            } catch {
              case _: Layout.AmbiguousRotationException =>
                ambiguousBases += base
            }
          }
        }
        // PASS 2 — reclaim what the heal left as garbage: `.old`
        // beside a live base, and staging with no backup (including a
        // crashed FIRST-EVER write, where no base exists yet — a
        // `.old` is only ever reclaimed against a live base, since a
        // backup without one always went through the heal above).
        // Anything whose base is ambiguous is untouchable this run.
        entries.foreach { st =>
          val n = st.getPath.getName
          rotSuffixes.find(n.endsWith(_)).foreach { suf =>
            val base = n.dropRight(suf.length)
            if (base.nonEmpty && !ambiguousBases.contains(base) &&
                sweepable(st) && fs.exists(st.getPath) &&
                (suf != ".old" || fs.exists(new Path(p, base)))) {
              val bytes =
                try fs.getContentSummary(st.getPath).getLength
                catch { case _: java.io.IOException => 0L }
              if (fs.delete(st.getPath, true)) {
                reclaimed += 1
                reclaimedBytes += bytes
              }
            }
          }
        }
        (reclaimed, reclaimedBytes, healed, ambiguousBases.size)
      }
    }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunGc <indexDir> [--wait <sec>]")
    val waitSec = args.indexOf("--wait") match {
      case i if i >= 0 && i + 1 < args.length => Some(args(i + 1).toLong)
      case i if i >= 0 => throw new IllegalArgumentException(
        "--wait requires a value in seconds")
      case _ => None
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-gc")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (dirs, bytes, healed, ambiguous) = run(spark, args(0), waitSec)
    println(s"""{"tool":"gc","reclaimed_dirs":$dirs,""" +
      s""""reclaimed_bytes":$bytes,"rotations_healed":$healed,""" +
      s""""ambiguous_rotations":$ambiguous}""")
    spark.stop()
  }
}
