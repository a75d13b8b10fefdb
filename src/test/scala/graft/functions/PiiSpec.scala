package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The PII scrub ([[TextOps.redactPii]] / [[TextOps.piiCounts]]): each
  * pattern redacts its shape, pattern ORDER prevents cross-tag
  * double-matching, counts agree with what redaction replaced, and the
  * scrub is idempotent (replacement tokens never re-match).
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redact(texts: String*): Seq[String] =
    texts.toDF("text").select(TextOps.redactPii(col("text"))).as[String].collect().toSeq

  private def counts(text: String): Map[String, Int] =
    Seq(text).toDF("text").select(TextOps.piiCounts(col("text")))
      .as[Map[String, Int]].head()

  test("each pattern family redacts its shape") {
    val got = redact(
      "mail me at alice.smith+news@example.co.uk today",
      "call (555) 123-4567 or +1 555.987.6543 now",
      "ssn 123-45-6789 on file",
      "card 4111 1111 1111 1111 charged",
      "host 192.168.0.1 responded")
    assert(got(0) == "mail me at [EMAIL] today")
    assert(got(1) == "call [PHONE] or [PHONE] now")
    assert(got(2) == "ssn [SSN] on file")
    assert(got(3) == "card [CARD] charged")
    assert(got(4) == "host [IPV4] responded")
  }

  test("clean text passes through untouched") {
    val clean = "the quick brown fox at version 2.5 saw 42 birds on 3 wires"
    assert(redact(clean) == Seq(clean))
    assert(counts(clean).values.forall(_ == 0))
  }

  test("pattern order: an email's domain never survives; a card is not phone-eaten") {
    // email first: nothing host-like remains afterwards
    assert(redact("bob@10.0.0.1.example.com wrote") == Seq("[EMAIL] wrote"))
    // card before phone: 16 digit groups leave no phone-shaped remnant
    val Seq(card) = redact("pay 4111-1111-1111-1111 please")
    assert(card == "pay [CARD] please", card)
    assert(!card.contains("[PHONE]"))
  }

  test("counts agree with the number of replacement tokens redaction emitted") {
    val text = "a@b.io and c@d.org; call 555-123-4567; 10.1.2.3 and 8.8.8.8; ssn 987-65-4321"
    val c = counts(text)
    assert(c("email") == 2 && c("phone") == 1 && c("ipv4") == 2 && c("ssn") == 1)
    val Seq(red) = redact(text)
    TextOps.PiiPatterns.foreach { case (tag, _) =>
      val tok = s"[${tag.toUpperCase}]"
      val n = red.sliding(tok.length).count(_ == tok)
      assert(n == c(tag), s"$tag: redacted $n, counted ${c(tag)}")
    }
  }

  test("the scrub is idempotent: replacement tokens never re-match") {
    val text = "a@b.io 555-123-4567 10.1.2.3 123-45-6789 4111 1111 1111 1111"
    val once = redact(text)
    assert(redact(once.head) == once)
    assert(counts(once.head).values.forall(_ == 0))
  }

  test("boundary negatives: out-of-range octets and short digit runs survive") {
    val got = redact("version 999.999.999.999 build 12-34 range 1-800")
    assert(got == Seq("version 999.999.999.999 build 12-34 range 1-800"))
  }

  test("phone: parenthesized area code with no separator still redacts") {
    assert(redact("call (555)123-4567 now") == Seq("call [PHONE] now"))
  }

  test("card: 13-digit Visa and 18/19-digit Maestro shapes redact") {
    val got = redact(
      "visa 4222222222222 pay",
      "maestro 676770000000000000 pay",
      "union 6250941006528599716 pay")
    assert(got == Seq("visa [CARD] pay", "maestro [CARD] pay", "union [CARD] pay"), got)
  }

  test("card never spans two adjacent distinct values across a space") {
    // ssn + phone adjacent: per-digit-optional separators would see one
    // 16-digit run and mislabel both, leaking a remnant — the groups-of-
    // four backreference form must leave each value to its own pattern
    assert(redact("ssn 123-45-6789 555-123-4567 done")
      == Seq("ssn [SSN] [PHONE] done"))
    assert(redact("phones 555-123-4567 555-987-6543 done")
      == Seq("phones [PHONE] [PHONE] done"))
  }
}
