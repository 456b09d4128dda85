package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.ops.FullText

/** The mutation lease exercised against a REAL second JVM — every
  * other lease fixture simulates a foreign holder by pre-creating
  * the lock file; this one spawns `graft.tools.HoldLease` as a live
  * competitor process (inheriting the forked test JVM's classpath)
  * and pins the three cross-process behaviors that simulation cannot
  * reach: a live foreign holder's acquire actually excludes this
  * JVM's mutators; a kill -9'd holder leaves the lease on disk; and
  * the stale-takeover path then recovers it. */
class CrossJvmLeaseSpec extends SparkSpecBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def fs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // the JDK-17 module opens Spark 4 needs outside spark-submit —
  // the same list build.sbt forks tests with
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("a live second JVM excludes this one; kill -9 leaves a stale lease the takeover recovers") {
    val docs = graft.io.Tables.documents(spark, dir).limit(80)
    val idx = java.nio.file.Files.createTempDirectory("lease-xjvm")
      .toFile.getAbsolutePath
    FullText.writeTextIndex(docs, "doc_id", "text", idx,
      storeTermVectors = true)
    val lock = new Path(s"$idx/_mutation.lock")
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq("-Xmx1g", "-cp", cp,
      "-Dspark.ui.enabled=false", "graft.tools.HoldLease", idx,
      "180000")).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(java.io.File.createTempFile("holdlease", ".log"))
    val proc = pb.start()
    try {
      // synchronize on the LOCK FILE: its creation IS the acquire
      val deadline = System.currentTimeMillis() + 120000
      while (!fs.exists(lock) && proc.isAlive &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(fs.exists(lock),
        "the child JVM must acquire the lease (did it start?)")
      // a LIVE foreign holder: this JVM's mutation fails fast, and
      // the error names the actual competing process
      val dead = docs.limit(2).select($"doc_id")
        .collect().map(_.getLong(0)).toSeq
      val e = intercept[IllegalStateException] {
        FullText.deleteFromTextIndex(spark, idx, dead)
      }
      assert(e.getMessage.contains("being mutated"))
      assert(e.getMessage.contains(s"pid=${proc.pid()}"),
        s"the refusal must name the live holder (got: ${e.getMessage})")
      // kill -9: the holder crashes WITHOUT releasing — the lease
      // file must survive its death (that is the crashed-holder
      // state the stale window exists to measure)
      proc.destroyForcibly()
      proc.waitFor()
      assert(fs.exists(lock),
        "a killed holder's lease must remain on disk")
      // stale takeover recovers the index: age the lease past the
      // window and the next mutation takes over with epoch+1
      fs.setTimes(lock, System.currentTimeMillis() - 3600L * 1000, -1)
      spark.conf.set("graft.index.leaseStaleMs", "1000")
      try {
        FullText.deleteFromTextIndex(spark, idx, dead)
        assert(spark.read
          .parquet(s"${FullText.liveArtifactDir(spark, idx)}/stats")
          .head().getAs[Long]("n_docs") == docs.count() - dead.size,
          "the takeover mutation must land exactly")
      } finally spark.conf.unset("graft.index.leaseStaleMs")
      assert(!Layout.pathExists(spark, s"$idx/_mutation.lock"),
        "the takeover's clean release must reclaim the lease")
    } finally {
      proc.destroyForcibly()
      ()
    }
  }
}
