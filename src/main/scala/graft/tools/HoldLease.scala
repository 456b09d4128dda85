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
    require(args.length >= 2,
      "usage: HoldLease <indexDir> <holdMs> [staleMs]")
    val indexDir = args(0)
    val holdMs = args(1).toLong
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-hold-lease")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional stale window: the cross-JVM storm fixture shrinks it so
    // this holder HEARTBEATS at test cadence (staleMs/3) while alive —
    // a kill -9 then leaves a lease that goes stale within seconds
    // instead of the 15-minute default
    if (args.length > 2)
      spark.conf.set("graft.index.leaseStaleMs", args(2))
    graft.io.Layout.withMutationLease(spark, indexDir) {
      Thread.sleep(holdMs)
    }
    spark.stop()
  }
}
