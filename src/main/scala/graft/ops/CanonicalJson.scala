package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.immutable.SortedMap

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions.udf

/** Deterministic document identity (reference schema.py:25-29
  * `stable_hash_id`): SHA-1 over canonically serialized JSON — keys
  * sorted, compact separators, no ASCII escaping — optionally salted.
  *
  * Spark's `to_json` preserves struct field order and escapes
  * differently, so canonicalization is hand-rolled (SURVEY §7.4-1):
  * struct fields and map keys are emitted in sorted order, making the
  * hash invariant under field reordering (property-tested in
  * CanonicalJsonSpec, mirroring tests/test_index_schema.py:12-14).
  *
  * Nulls: a struct field that is null serializes as JSON null (the
  * reference's dicts simply lack absent keys; with fixed schemas null
  * is the honest representation — documented divergence, determinism
  * properties are identical).
  */
object CanonicalJson {

  def canonicalize(value: Any): String = {
    val sb = new StringBuilder
    write(value, sb)
    sb.toString
  }

  private def write(value: Any, sb: StringBuilder): Unit = value match {
    case null => sb.append("null")
    case r: Row =>
      val fields =
        if (r.schema != null)
          SortedMap.from(r.schema.fieldNames.zipWithIndex.map {
            case (n, i) => n -> r.get(i)
          })
        else sys.error("canonicalJson requires a schema-carrying Row")
      writeObj(fields, sb)
    case m: Map[_, _] =>
      writeObj(SortedMap.from(m.map { case (k, v) => k.toString -> v }), sb)
    case s: Seq[_] =>
      sb.append('[')
      var first = true
      s.foreach { v =>
        if (!first) sb.append(',')
        first = false
        write(v, sb)
      }
      sb.append(']')
    case s: String => writeString(s, sb)
    case b: Boolean => sb.append(if (b) "true" else "false")
    case b: Byte => sb.append(b.toInt)
    case i: Short => sb.append(i.toInt)
    case i: Int => sb.append(i)
    case l: Long => sb.append(l)
    case f: Float => writeDouble(f.toDouble, sb)
    case d: Double => writeDouble(d, sb)
    case d: java.math.BigDecimal => sb.append(d.toPlainString)
    case d: BigDecimal => sb.append(d.bigDecimal.toPlainString)
    case t: java.sql.Timestamp => writeString(t.toString, sb)
    case t: java.time.Instant => writeString(t.toString, sb)
    case d: java.sql.Date => writeString(d.toString, sb)
    case d: java.time.LocalDate => writeString(d.toString, sb)
    case b: Array[Byte] =>
      writeString(java.util.Base64.getEncoder.encodeToString(b), sb)
    case other => writeString(other.toString, sb)
  }

  private def writeDouble(d: Double, sb: StringBuilder): Unit =
    if (d == d.toLong.toDouble && math.abs(d) < 1e15 &&
        java.lang.Double.doubleToRawLongBits(d) != Long.MinValue)
      // integral doubles print like Python's json (42.0 -> "42.0");
      // abs < 1e15 keeps decpt <= 16 (Python's fixed-notation range);
      // -0.0 (sign bit alone) falls through to keep its sign
      sb.append(d.toLong).append(".0")
    else sb.append(pythonRepr(d))

  /** Python float repr: the shortest decimal digit string that parses
    * back to the same double, rendered with CPython's notation rule
    * (fixed when the decimal point lands in (-4, 16], else exponential
    * with a signed, >=2-digit exponent) — so e.g. 12345678.5 and 1e-07
    * print exactly as json.dumps writes them, where Scala's
    * Double.toString would emit 1.23456785E7 / 1.0E-7 and diverge the
    * stable hashes (reference schema.py:25-29). */
  private def pythonRepr(d: Double): String = {
    if (d.isNaN) return "NaN" // json.dumps spellings for non-finite
    if (d == Double.PositiveInfinity) return "Infinity"
    if (d == Double.NegativeInfinity) return "-Infinity"
    val neg = java.lang.Double.doubleToRawLongBits(d) < 0
    val a = math.abs(d)
    if (a == 0.0) return if (neg) "-0.0" else "0.0"
    // shortest round-tripping digits via %.{p-1}e candidates (the
    // round-trip check makes the choice exact, not heuristic)
    var p = 1
    var sci = ""
    while ({
      sci = String.format(java.util.Locale.ROOT, s"%.${p - 1}e", Double.box(a))
      sci.toDouble != a && p < 17
    }) p += 1
    val Array(mant, expStr) = sci.split("e")
    val digits = mant.replace(".", "")
    val decpt = expStr.toInt + 1 // value = 0.<digits> * 10^decpt
    val sb = new StringBuilder
    if (neg) sb.append('-')
    if (decpt <= -4 || decpt > 16) {
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits.substring(1))
      val e = decpt - 1
      sb.append('e').append(if (e < 0) '-' else '+')
      val ae = math.abs(e)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    } else if (decpt <= 0) {
      sb.append("0.").append("0" * -decpt).append(digits)
    } else if (decpt >= digits.length) {
      sb.append(digits).append("0" * (decpt - digits.length)).append(".0")
    } else {
      sb.append(digits.substring(0, decpt)).append('.')
        .append(digits.substring(decpt))
    }
    sb.toString
  }

  private def writeObj(fields: SortedMap[String, Any], sb: StringBuilder): Unit = {
    sb.append('{')
    var first = true
    fields.foreach { case (k, v) =>
      if (!first) sb.append(',')
      first = false
      writeString(k, sb)
      sb.append(':')
      write(v, sb)
    }
    sb.append('}')
  }

  /** Python-json-compatible string escaping with ensure_ascii=False:
    * short escapes for the common control chars, \u00XX for the rest,
    * non-ASCII passed through. */
  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  def sha1Hex(s: String): String =
    MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** stable_hash_id(doc, salt) — SHA-1 hex of salt + canonical JSON. */
  def stableHashId(row: Row, salt: String = ""): String =
    sha1Hex(salt + canonicalize(row))

  // ---- Spark column functions -------------------------------------------

  private val canonicalJsonUdf = udf((r: Row) => canonicalize(r))
  private val stableHashIdUdf = udf((r: Row, salt: String) => stableHashId(r, salt))

  /** canonical_json(struct(...)) — sorted-key compact JSON string. */
  def canonical_json(c: Column): Column = canonicalJsonUdf(c)

  /** stable_hash_id(struct(...), salt) — deterministic SHA-1 id column. */
  def stable_hash_id(c: Column, salt: Column): Column = stableHashIdUdf(c, salt)
}
