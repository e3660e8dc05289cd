package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {

  test("kAnonymityAudit flags groups below k; suppressionSet returns their rows") {
    import spark.implicits._
    val df = (Seq.fill(10)(("US", "M")) ++ Seq.fill(4)(("US", "F")) ++
      Seq.fill(1)(("FR", "M"))).zipWithIndex
      .map { case ((c, g), i) => (i.toLong, c, g) }
      .toDF("id", "country", "gender")
    val audit = Privacy.kAnonymityAudit(df, Seq("country", "gender"), k = 5)
      .collect()
      .map(r => (r.getAs[String]("country"), r.getAs[String]("gender")) ->
        (r.getAs[Long]("group_size"), r.getAs[Boolean]("anonymous"))).toMap
    assert(audit(("US", "M")) === ((10L, true)))
    assert(audit(("US", "F")) === ((4L, false)))
    assert(audit(("FR", "M")) === ((1L, false)))
    val suppressed = Privacy.suppressionSet(df, Seq("country", "gender"), k = 5)
    assert(suppressed.count() === 5) // 4 US/F + 1 FR/M rows
    assert(suppressed.filter(col("country") === "US" && col("gender") === "M").count() === 0)
  }
}
