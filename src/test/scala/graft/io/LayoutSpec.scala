package graft.io

import graft.SparkSpecBase

class LayoutSpec extends SparkSpecBase {

  test("joins on co-bucketed tables plan no Exchange") {
    import spark.implicits._
    val facts = spark.range(10000)
      .select(($"id" % 500).as("k"), $"id".as("v"))
    val dims = spark.range(500).select($"id".as("k"), ($"id" * 2).as("w"))
    try {
      Layout.writeBucketed(facts, "t_facts_bucketed", Seq("k"), 8)
      Layout.writeBucketed(dims, "t_dims_bucketed", Seq("k"), 8)
      val joined = spark.table("t_facts_bucketed")
        .join(spark.table("t_dims_bucketed"), Seq("k"))
      // disable broadcast so the join would otherwise shuffle both sides
      val plan = withNoBroadcast {
        joined.queryExecution.executedPlan.toString
      }
      assert(!plan.contains("Exchange"), plan)
      assert(withNoBroadcast { joined.count() } == 10000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_facts_bucketed")
      spark.sql("DROP TABLE IF EXISTS t_dims_bucketed")
    }
  }

  test("copyArtifact carries _rowcount in both regimes; tombstoneRowCount never scans when recorded") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("layout-copy")
      .toFile.getAbsolutePath
    val ids = (1L to 500L).toDF("doc_id")
    Layout.writeTombstoneArtifact(spark, ids, s"$base/tomb", 500L)
    assert(Layout.pathExists(spark, s"$base/tomb/_rowcount"))
    // recorded count reads WITHOUT evaluating the frame — a by-name
    // argument that throws proves no scan happens
    assert(Layout.tombstoneRowCount(spark, s"$base/tomb",
      sys.error("the recorded count must short-circuit the frame")) == 500L)
    // small regime: raw byte copy, side file survives
    Layout.copyArtifact(spark, s"$base/tomb", s"$base/tomb_small")
    assert(Layout.pathExists(spark, s"$base/tomb_small/_rowcount"))
    assert(spark.read.parquet(s"$base/tomb_small").count() == 500L)
    // large regime (forced by a tiny threshold): the parquet content
    // copies DISTRIBUTED — a corpus-scale tombstone set mid-backlog
    // must never serialize through one driver stream — and the
    // _rowcount side file still follows
    spark.conf.set("graft.index.artifactCopyMaxBytes", "1")
    try {
      Layout.copyArtifact(spark, s"$base/tomb", s"$base/tomb_big")
      assert(Layout.pathExists(spark, s"$base/tomb_big/_rowcount"))
      assert(Layout.tombstoneRowCount(spark, s"$base/tomb_big",
        sys.error("recorded count must carry through the copy")) == 500L)
      assert(spark.read.parquet(s"$base/tomb_big")
        .orderBy($"doc_id").collect().map(_.getLong(0)).toSeq ==
        (1L to 500L))
    } finally spark.conf.unset("graft.index.artifactCopyMaxBytes")
    // legacy artifact (no _rowcount): the fallback counts the frame
    ids.write.parquet(s"$base/legacy")
    assert(Layout.tombstoneRowCount(spark, s"$base/legacy",
      spark.read.parquet(s"$base/legacy")) == 500L)
  }

  private def withNoBroadcast[A](f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, old)
  }

  test("rotation self-heal: rewriteParquet and compactParquetDir restore a crashed predecessor's .old backup") {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def rot(path: String): Unit = assert(fs.rename(
      new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".old")))
    // rewriteParquet: the crash-between-renames state (live path
    // missing, .old holding the only copy) previously hit the entry
    // delete of .old — destroying the backup — or failed on the
    // missing input; the heal restores it before either
    val dir = java.nio.file.Files.createTempDirectory("rot-heal")
      .toFile.getAbsolutePath
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.parquet(s"$dir/art")
    rot(s"$dir/art")
    Layout.rewriteParquet(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), s"$dir/art")
    assert(spark.read.parquet(s"$dir/art").count() == 3,
      "the healed rewrite must land the replacement frame")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/art.old")))
    // compactParquetDir: same crash state; the fold must see the
    // restored rows, not report an empty directory
    Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("k", "v")
      .write.parquet(s"$dir/cmp")
    rot(s"$dir/cmp")
    val (_, _, rows) = Layout.compactParquetDir(spark, s"$dir/cmp")
    assert(rows == 3,
      s"the healed fold must rewrite the restored rows (got $rows)")
    assert(spark.read.parquet(s"$dir/cmp").count() == 3)
  }

  test("the generic swap writers refuse the ambiguous rotation trio and keep all three artifacts") {
    // base + .old + staging all present: on a copy-rename store a
    // different one is partial depending on the crash point, so
    // rewriteParquet/compactParquetDir must NOT purge-and-proceed
    // (the purge would destroy the only complete copies) — the heal
    // they share throws before anything is touched
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rot-amb")
      .toFile.getAbsolutePath
    def trio(base: String, stagingSuffix: String): Unit = {
      Seq((1L, "a")).toDF("k", "v").write.parquet(s"$dir/$base")
      Seq((1L, "a")).toDF("k", "v").write.parquet(s"$dir/$base.old")
      Seq((2L, "b")).toDF("k", "v")
        .write.parquet(s"$dir/$base$stagingSuffix")
    }
    trio("rw", ".new")
    intercept[Layout.AmbiguousRotationException] {
      Layout.rewriteParquet(spark,
        Seq((9L, "z")).toDF("k", "v"), s"$dir/rw")
    }
    trio("cp", ".compact")
    intercept[Layout.AmbiguousRotationException] {
      Layout.compactParquetDir(spark, s"$dir/cp")
    }
    Seq("rw", "rw.old", "rw.new", "cp", "cp.old", "cp.compact")
      .foreach(n => assert(Layout.pathExists(spark, s"$dir/$n"),
        s"$n must survive the refusal — the operator needs it"))
  }

  test("CreateCommitMarker is create-IF-ABSENT and stamps the fence token") {
    // a pre-existing `_COMMITTED` is protocol-unreachable (the gen
    // dir stages token-unique and commitGeneration deletes a leftover
    // final name before its rename), so the default publisher turns
    // "can't happen" into a LOUD failure instead of silently
    // re-publishing over another writer's marker — and the marker
    // content records WHICH fence token published the generation
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("marker")
      .toFile.getAbsolutePath
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$dir/_COMMITTED")
    val pub = new CreateCommitMarker
    assert(pub.publish(fs, marker, dir, Some("cafe0123cafe")))
    def content(): String = {
      val in = fs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    assert(content() == "cafe0123cafe",
      "the marker must carry the publishing writer's fence token")
    val e = intercept[java.io.IOException] {
      pub.publish(fs, marker, dir, Some("beefbeefbeef"))
    }
    assert(e != null)
    assert(content() == "cafe0123cafe",
      "a refused re-publish must leave the original marker intact")
    // a lease-less legacy caller publishes an EMPTY marker (no token
    // to attribute) — still create-if-absent
    val marker2 = new Path(s"$dir/_COMMITTED2")
    assert(pub.publish(fs, marker2, dir, None))
    assert(fs.getFileStatus(marker2).getLen == 0)
  }
}
