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

  test("l-diversity flags a k-large but homogeneous group, not a diverse one") {
    val spark = graft.testkit.SparkTestSession.spark
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    // QI group (SEG, 1): 5 members, ALL in balance band 1 → l = 1 (at
    // risk despite being k=5-safe); group (SEG, 2): 3 members in bands
    // 0/2/7 → l = 3 (safe)
    val rows = (1 to 5).map(i => (i.toLong, s"c$i", 1, 1500.0 + i, "SEG")) ++
      Seq((6L, "c6", 2, 10.0, "SEG"), (7L, "c7", 2, 2500.0, "SEG"),
        (8L, "c8", 2, 7999.0, "SEG"))
    val dir = Files.createTempDirectory("graft-ldiv").toString
    import spark.implicits._
    rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .withColumn("c_nationkey", col("c_nationkey").cast("int"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = Pii.lDiversity(spark, dir, l = 3).collect().head
    assert(r.getAs[String]("segment") === "SEG")
    assert(r.getAs[Long]("n_groups") === 2)
    assert(r.getAs[Long]("min_l") === 1)
    assert(r.getAs[Long]("max_l") === 3)
    assert(r.getAs[Long]("groups_below_l") === 1)
    assert(r.getAs[Long]("rows_at_risk") === 5)
  }

  test("masking pseudonymizes deterministically and leaks no raw identifier") {
    val spark = graft.testkit.SparkTestSession.spark
    val masked = Pii.maskColumns(spark, "/root/testdata/sf0.001")
    val rows = masked.collect()
    val names = graft.sources.Tables.customer(spark, "/root/testdata/sf0.001")
      .select("c_name").collect().map(_.getString(0)).toSet
    // no raw name survives, pseudonyms are md5-shaped and collision-free
    // (deterministic: the same subject masks identically across exports)
    val pseudo = rows.map(_.getAs[String]("name_pseudo"))
    assert(pseudo.forall(p => p.length == 32 && !names.contains(p)))
    assert(pseudo.distinct.length === names.size)
    // balances only ever appear generalized to the 1000 band
    assert(rows.forall(_.getAs[Long]("acctbal_band") % 1000 === 0))
  }
}
