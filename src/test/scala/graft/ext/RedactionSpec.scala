package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactionSpec extends SparkSpec {

  test("redact masks emails, phones, IPs, then digit runs — in rule order") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact alice@example.com or 12-345-678-9012 at 10.0.0.1 room 42"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c@d.org and 7 dwarfs")
    ).toDF("id", "text")
    val out = Redaction.redact(df, "text").collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_email"), r.getAs[Long]("n_phone"),
          r.getAs[Long]("n_ipv4"), r.getAs[Long]("n_number"),
          r.getAs[String]("redacted"))).toMap

    assert(out(1L) === ((1L, 1L, 1L, 1L,
      "contact <EMAIL> or <PHONE> at <IP> room <NUM>")))
    assert(out(2L) === ((0L, 0L, 0L, 0L, "no pii here at all")))
    // email digits are consumed by the email rule, not recounted as numbers
    assert(out(3L) === ((2L, 0L, 0L, 1L, "two mails <EMAIL> <EMAIL> and <NUM> dwarfs")))
  }

  test("later rules see earlier masks: digits inside an IP never leak") {
    import spark.implicits._
    val df = Seq((1L, "addr 192.168.1.255 end")).toDF("id", "text")
    val r = Redaction.redact(df, "text").collect().head
    assert(r.getAs[String]("redacted") === "addr <IP> end")
    assert(r.getAs[Long]("n_number") === 0L)
  }

  test("matchCount counts non-overlapping matches") {
    import spark.implicits._
    val df = Seq("1 22 333 4444").toDF("s")
    val n = df.select(Redaction.matchCount(col("s"), "[0-9]+").as("n"))
      .collect().head.getAs[Long]("n")
    assert(n === 4L)
  }
}
