package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.testkit.SparkTestSession

/** Invariants for PII scrubbing on planted fixtures: detection counts,
  * redaction content, idempotence, and clean-text passthrough.
  */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def scrub(text: String) = {
    val row = Pii.scrubOf(Seq((1L, text)).toDF("doc_id", "text")).collect().head
    (row.getInt(1), row.getInt(2), row.getInt(3), row.getBoolean(4), row.getString(5))
  }

  test("emails, phones, and IPs are counted and redacted") {
    val (e, p, ip, flag, red) = scrub(
      "contact jane.doe+spam@example.co.uk or call 555-123-4567 from 192.168.0.1 now")
    assert((e, p, ip, flag) === (1, 1, 1, true))
    assert(red === s"contact ${Pii.EmailToken} or call ${Pii.PhoneToken} from ${Pii.IpToken} now")
  }

  test("scrubbing is idempotent: a redacted text has no PII left") {
    val (_, _, _, _, once) = scrub("mail a@b.io, ip 10.0.0.1, tel 555 123 4567")
    val (e2, p2, ip2, flag2, twice) = scrub(once)
    assert((e2, p2, ip2, flag2) === (0, 0, 0, false))
    assert(twice === once)
  }

  test("clean text passes through untouched") {
    val text = "no personal data here just words and the number 42"
    val (e, p, ip, flag, red) = scrub(text)
    assert((e, p, ip, flag) === (0, 0, 0, false))
    assert(red === text)
  }

  test("counts count matches, not docs: three emails in one doc") {
    val (e, _, _, _, red) = scrub("a@x.com b@y.org c@z.net")
    assert(e === 3)
    assert(red === s"${Pii.EmailToken} ${Pii.EmailToken} ${Pii.EmailToken}")
  }

  test("a phone-like digit run inside a longer number is not matched (word boundaries)") {
    val (_, p, _, _, red) = scrub("order 9555-123-45678 is fine")
    assert(p === 0)
    assert(red === "order 9555-123-45678 is fine")
  }
}
