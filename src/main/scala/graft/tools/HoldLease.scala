package graft.tools

import org.apache.spark.sql.SparkSession

/** Cross-JVM lease-test harness: hold `indexDir`'s mutation lease
  * from a SEPARATE process for `holdMs` milliseconds.
  * CrossJvmLeaseSpec spawns this as a real second JVM — the only way
  * to observe the filesystem lease's fail-fast from genuinely
  * outside the caller's JVM (in-JVM tests can only simulate a
  * foreign holder by pre-creating the lock file, which never
  * exercises the acquire/heartbeat/release machinery of a live
  * competitor). Acquires the lease, sleeps inside the mutation body,
  * and exits cleanly (releasing) — unless killed first, which leaves
  * exactly the crashed-holder state the stale-takeover path exists
  * for. The parent synchronizes on the lock FILE appearing, not on
  * stdout. */
object HoldLease {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: HoldLease <indexDir> <holdMs>")
    val indexDir = args(0)
    val holdMs = args(1).toLong
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-hold-lease")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.io.Layout.withMutationLease(spark, indexDir) {
      Thread.sleep(holdMs)
    }
    spark.stop()
  }
}
