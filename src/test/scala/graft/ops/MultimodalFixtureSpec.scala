package graft.ops

import graft.SparkSpecBase

/** Full-row oracle for q31 (multimodal decode): binary decode has no
  * DuckDB expression, so the driver's gate is rows-only — this spec
  * closes the gap by replaying the whole q31 pipeline over the
  * sf0.001 documents table and comparing every row against a fixture
  * computed by an independent Python re-implementation
  * (tools/gen_multimodal_fixture.py), including the IEEE arithmetic
  * of the per-frame features and the HALF_UP 4-place rounding. */
class MultimodalFixtureSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("q31 decode output matches the Python-pinned fixture row-for-row") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val json = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/multimodal_fixture.json"), "UTF-8")
      .mkString
    val rowRe = ("""\{\s*"media_id":\s*(\d+),\s*"media_type":\s*"(\w+)",""" +
      """\s*"n_bytes":\s*(\d+),\s*"n_frames":\s*(\d+),""" +
      """\s*"feature_norm":\s*([-0-9.eE]+)\s*\}""").r
    val want = rowRe.findAllMatchIn(json).map { m =>
      (m.group(1).toLong, m.group(2), m.group(3).toLong, m.group(4).toLong,
        m.group(5).toDouble)
    }.toSeq
    assert(want.size == 500)

    val got = graft.queries.PipelineQueries.multimodalDecode(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .toSeq
    assert(got.size == want.size)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"got=$g want=$w") }
  }
}
