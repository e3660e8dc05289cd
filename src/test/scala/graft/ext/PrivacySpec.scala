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

  test("pseudonymize: deterministic, salt-dependent; audit flags short-token collisions") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"user$i")).toDF("id", "name")
    val run1 = Privacy.pseudonymize(df, "id", "s1").select("id", "token").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val run2 = Privacy.pseudonymize(df, "id", "s1").select("id", "token").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run1 === run2, "same salt ⇒ same mapping (joins keep working)")
    assert(run1.values.toSet.size === 500, "no collisions at 16 hex chars")
    val other = Privacy.pseudonymize(df, "id", "s2").select("id", "token").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run1.keySet.count(k => run1(k) == other(k)) < 5, "salt changes the mapping")
    // 1 hex char = 16 possible tokens over 500 ids ⇒ collisions guaranteed
    val audit = Privacy.pseudonymAudit(df, "id", "s1", tokenLen = 1)
    assert(audit.count() === 500)
    assert(audit.filter(col("collision")).count() > 0)
    assert(audit.select("token").distinct().count() <= 16)
    // per-token counts add back up to the id universe
    assert(audit.select("token", "ids_on_token").distinct()
      .agg(sum("ids_on_token")).first().getLong(0) === 500L)
  }
}
