package graft.ops

import graft.SparkSpecBase

class MultimodalSpec extends SparkSpecBase {

  test("decodeStub chunks payloads into fixed-size frames") {
    val frames = Multimodal.decodeStub(new Array[Byte](600), "image")
    assert(frames.map(_.length).toSeq == Seq(256, 256, 88))
    assert(Multimodal.decodeStub(Array.empty[Byte], "audio").isEmpty)
  }

  test("frameFeature is mean unsigned byte value") {
    assert(Multimodal.frameFeature(Array[Byte](0, -1)) == 127.5) // (0+255)/2
    assert(Multimodal.frameFeature(Array.empty[Byte]) == 0.0)
  }

  test("sampleFrames keeps every k-th frame; resizeStub truncates/pads") {
    val frames = Array.tabulate(9)(i => Array.fill[Byte](4)(i.toByte))
    val sampled = Multimodal.sampleFrames(frames, 4)
    assert(sampled.map(_.head.toInt).toSeq == Seq(0, 4, 8))
    assert(Multimodal.sampleFrames(frames, 1).length == 9)
    assert(Multimodal.sampleFrames(Array.empty[Array[Byte]], 4).isEmpty)
    assert(Multimodal.resizeStub(Array[Byte](1, 2, 3, 4), 2).toSeq ==
      Seq[Byte](1, 2))
    assert(Multimodal.resizeStub(Array[Byte](1, 2), 4).toSeq ==
      Seq[Byte](1, 2, 0, 0))
  }

  test("decodeFeatures: typed batched pipeline end to end") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Array.fill[Byte](300)(2)),
      Multimodal.MediaRow(2L, "audio", Array.empty[Byte]))
      .toDS().repartition(2)
    val out = Multimodal.decodeFeatures(media).collect()
      .map(d => d.media_id -> d).toMap
    assert(out(1L).n_frames == 2L)
    assert(out(1L).n_bytes == 300L)
    assert(out(1L).features.toSeq == Seq(2.0, 2.0))
    assert(out(1L).feature_norm == math.sqrt(8.0))
    assert(out(2L).n_frames == 0L)
    assert(out(2L).feature_norm == 0.0)
  }
}
