package graft.queries

import java.nio.file.Files

import graft.SparkSpecBase

/** Sequence-packing semantics: the block-decomposed distributed
  * prefix sum must EQUAL the naive sequential cumsum — including over
  * id gaps, uneven blocks, and empty documents. */
class SequencePackSpec extends SparkSpecBase {

  test("block-decomposed cumsum equals the sequential packing") {
    import spark.implicits._
    val d = Files.createTempDirectory("seqpack").toFile.getAbsolutePath
    // gappy ids spanning several 64-blocks; token counts 1-word deltas
    val docs = Seq(
      0L -> "one two three",
      1L -> "a b c d e f g",
      5L -> "", // empty doc: zero tokens, spans zero sequences
      63L -> Seq.fill(600)("w").mkString(" "), // crosses seq boundaries
      64L -> "x y",
      130L -> Seq.fill(20)("v").mkString(" "),
      200L -> "tail doc here now")
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = PipelineQueries.sequencePack(spark, d, seqLen = 512L,
      blockSize = 64L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // sequential reference
    var cum = 0L
    val expect = docs.sortBy(_._1).map { case (id, t) =>
      val n = t.split("\\s+").count(_.nonEmpty).toLong
      val start = cum; cum += n
      val first = start / 512
      val spans = if (n == 0) 0L else (start + n - 1) / 512 - first + 1
      (id, n, start, first, spans)
    }
    assert(rows.toSeq == expect,
      s"\ngot    ${rows.toSeq}\nexpect $expect")
    // the 600-token doc at id 63 must span two+ sequences
    assert(expect.find(_._1 == 63L).get._5 >= 2L)
  }
}
