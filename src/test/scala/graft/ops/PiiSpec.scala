package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** PII detection/redaction contract: match sets per pattern, the
  * pinned redaction order (email → IPv4 → IBAN → SSN → card → phone), and idempotence. */
class PiiSpec extends SparkSpecBase {

  private def one(text: String): (Long, Long, Long, String) = {
    import spark.implicits._
    val r = Seq(Tuple1(text)).toDF("t")
      .select(
        Pii.emailCount($"t"), Pii.ipv4Count($"t"), Pii.phoneCount($"t"),
        Pii.redact($"t"))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("counts and redaction over a mixed sample") {
    val (e, ip, ph, red) = one(
      "mail a.b+c%d@sub.example.org or x@y.io, host 10.0.255.1, call 555-0199")
    assert(e == 2L)
    assert(ip == 1L)
    assert(ph == 1L)
    assert(red ==
      "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE>")
  }

  test("email redaction runs first: digits and dots inside an address never leak as IP/phone") {
    // the local part contains an IPv4-shaped and a phone-shaped token;
    // with email first the whole address collapses to <EMAIL>
    val (e, ip, ph, red) = one("report 10.1.1.1-555-0000@spam.example.com end")
    assert(e == 1L)
    assert(red == "report <EMAIL> end")
    // the raw counters still see the embedded shapes (detection is
    // per-pattern, independent of redaction order)
    assert(ip == 1L && ph == 1L)
  }

  test("word boundaries: digits embedded in tokens do not match") {
    val (_, ip, ph, red) = one("version v1.2.3.4beta and id 123-45678 stay")
    assert(ip == 0L)
    assert(ph == 0L)
    assert(red == "version v1.2.3.4beta and id 123-45678 stay")
  }

  test("over-matching octets is intended scrubber behavior") {
    val (_, ip, _, red) = one("bad octet 999.999.999.999 still masked")
    assert(ip == 1L)
    assert(red == "bad octet <IP> still masked")
  }

  test("NANP forms: 10-digit, parenthesized, +1 — redacted whole, never carved") {
    val (_, _, ph, red) = one(
      "call 555-123-4567 or (555) 123-4567 or +1 555.123.4567 or 555-0199")
    assert(ph == 4L)
    // the old NNN-NNNN-only pattern produced "555-<PHONE>" here
    assert(red == "call <PHONE> or <PHONE> or <PHONE> or <PHONE>")
  }

  test("longer digit runs don't partially redact") {
    val (_, _, ph, red) = one("ref 555-123-45678 stays")
    // 3-3-5 is neither a 10-digit nor a 7-digit phone; no partial bite
    assert(ph == 0L)
    assert(red == "ref 555-123-45678 stays")
  }

  test("redaction is idempotent") {
    import spark.implicits._
    val dirty = "a@b.co at 10.0.0.1 tel 555-1234"
    val once = one(dirty)._4
    val twice = Seq(Tuple1(once)).toDF("t").select(Pii.redact($"t"))
      .head().getString(0)
    assert(once == twice)
  }

  private def more(text: String): (Long, Long, Long, String) = {
    import spark.implicits._
    val r = Seq(Tuple1(text)).toDF("t")
      .select(
        Pii.ssnCount($"t"), Pii.creditCardCount($"t"), Pii.ibanCount($"t"),
        Pii.redact($"t"))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("SSN redacts whole, before the 7-digit phone alternative") {
    val (ssn, _, _, red) = more("ssn 123-45-6789 on file")
    assert(ssn == 1L)
    // phone's \b\d{3}-\d{4}\b must never carve the SSN's tail
    assert(red == "ssn <SSN> on file")
  }

  test("cards: grouped and bare-16 both redact whole") {
    val (_, cc, _, red) =
      more("pay 4111-2222-3333-4444 or 4111222233334444 now")
    assert(cc == 2L)
    assert(red == "pay <CARD> or <CARD> now")
  }

  test("cards: Amex 4-6-5 grouping and 13/19-digit bare PANs redact whole") {
    val (_, cc, _, red) = more(
      "amex 3782-822463-10005 or 3782 822463 10005, visa13 4222222222222, " +
        "maestro 6759649826438453128 end")
    assert(cc == 4L)
    assert(red ==
      "amex <CARD> or <CARD>, visa13 <CARD>, maestro <CARD> end")
  }

  test("cards: runs outside the 13-19 PAN length range stay untouched") {
    val (_, cc, _, red) = more("order 123456789012 ref 12345678901234567890")
    // 12 digits is below the PAN floor; 20 is above the ceiling and the
    // greedy retreat finds a digit after every stop in both engines
    assert(cc == 0L)
    assert(red == "order 123456789012 ref 12345678901234567890")
  }

  test("IBAN redacts before the bare-16 card alternative can bite its tail") {
    val (_, cc, ib, red) = more("wire DE44500105175407324931 today")
    assert(ib == 1L)
    assert(red == "wire <IBAN> today")
    // the raw-text card count sees no 16-digit run (letters break \b\d{16}\b)
    assert(cc == 0L)
  }

  test("full-chain redaction is idempotent") {
    import spark.implicits._
    val dirty = "a@b.co 10.0.0.1 ssn 123-45-6789 card 4111-2222-3333-4444 " +
      "iban DE44500105175407324931 tel 555-1234"
    val once = more(dirty)._4
    val twice = Seq(Tuple1(once)).toDF("t").select(Pii.redact($"t"))
      .head().getString(0)
    assert(once == twice)
    assert(once == "<EMAIL> <IP> ssn <SSN> card <CARD> iban <IBAN> tel <PHONE>")
  }

  test("null and empty text pass through") {
    import spark.implicits._
    val r = Seq(Tuple1(Option.empty[String]), Tuple1(Some("")))
      .toDF("t")
      .select(Pii.emailCount($"t").as("e"), Pii.redact($"t").as("r"))
      .collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(r(1).getLong(0) == 0L && r(1).getString(1) == "")
  }
}
