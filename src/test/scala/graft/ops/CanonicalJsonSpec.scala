package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference tests/test_index_schema.py:12-35: stable_hash_id is
  * deterministic under key reordering and matches Python's
  * json.dumps(sort_keys=True, separators=(",",":"), ensure_ascii=False)
  * byte-for-byte on the supported value domain (hashes pinned from
  * CPython output).
  */
class CanonicalJsonSpec extends AnyFunSuite {

  private def row(schema: StructType, values: Any*): Row =
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      values.toArray, schema)

  test("canonical form matches CPython json.dumps output") {
    val schema = StructType(Seq(
      StructField("b", IntegerType),
      StructField("a", ArrayType(StringType)),
      StructField("c", StringType),
      StructField("d", BooleanType)))
    val r = row(schema, 1, Seq(1.5, "x"), null, true)
    assert(CanonicalJson.canonicalize(r) ==
      """{"a":[1.5,"x"],"b":1,"c":null,"d":true}""")
    assert(CanonicalJson.stableHashId(r) ==
      "ca90584b17da4644ee3865213ac4e18a50f0b361")
    assert(CanonicalJson.stableHashId(r, "salt") ==
      "3f667fab3b99da66e83dc46a6d5b689db5770259")
  }

  test("string escaping: quotes, control chars, non-ASCII passthrough") {
    val schema = StructType(Seq(
      StructField("msg", StringType), StructField("n", DoubleType)))
    val r = row(schema, "héllo \"w\"\nline2\ttab", 42.0)
    assert(CanonicalJson.canonicalize(r) ==
      "{\"msg\":\"héllo \\\"w\\\"\\nline2\\ttab\",\"n\":42.0}")
    assert(CanonicalJson.stableHashId(r) ==
      "d11c423ee4b2e61e0bd6fb78f04a64d9125ac9d5")
  }

  test("hash is invariant under field reordering") {
    val rnd = new scala.util.Random(42)
    val cases = Seq((0, "", false), (-1, "héllo", true),
      (Int.MaxValue, "a\"b\\c\nd", true)) ++
      (1 to 50).map(_ => (rnd.nextInt(), rnd.nextString(8), rnd.nextBoolean()))
    for ((a, b, c) <- cases) {
      val s1 = StructType(Seq(StructField("x", IntegerType),
        StructField("y", StringType), StructField("z", BooleanType)))
      val s2 = StructType(Seq(StructField("z", BooleanType),
        StructField("x", IntegerType), StructField("y", StringType)))
      val h1 = CanonicalJson.stableHashId(row(s1, a, b, c))
      val h2 = CanonicalJson.stableHashId(row(s2, c, a, b))
      assert(h1 == h2, s"case ($a, $b, $c)")
    }
  }

  test("doubles render exactly as CPython json.dumps (320-case pin)") {
    val schema = StructType(Seq(StructField("d", DoubleType)))
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/double_repr_fixture.txt"), "UTF-8")
    val cases = src.getLines().filter(_.nonEmpty).map { line =>
      val Array(bits, want) = line.split(" ", 2)
      java.lang.Double.longBitsToDouble(
        java.lang.Long.parseUnsignedLong(bits)) -> want
    }.toSeq
    src.close()
    assert(cases.size == 320)
    for ((d, want) <- cases) {
      val got = CanonicalJson.canonicalize(row(schema, d))
      assert(got == s"""{"d":$want}""",
        s"bits=${java.lang.Double.doubleToRawLongBits(d)} got=$got want=$want")
    }
  }

  test("different salt changes the hash") {
    val schema = StructType(Seq(StructField("k", StringType)))
    val r = row(schema, "v")
    assert(CanonicalJson.stableHashId(r, "a") !=
      CanonicalJson.stableHashId(r, "b"))
  }

  test("nested structs and maps serialize sorted") {
    val inner = StructType(Seq(
      StructField("z", IntegerType), StructField("a", IntegerType)))
    val outer = StructType(Seq(StructField("n", inner)))
    val r = row(outer, row(inner, 1, 2))
    assert(CanonicalJson.canonicalize(r) == """{"n":{"a":2,"z":1}}""")
    assert(CanonicalJson.canonicalize(Map("b" -> 2, "a" -> 1)) ==
      """{"a":1,"b":2}""")
  }
}
