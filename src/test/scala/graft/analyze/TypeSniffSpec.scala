package graft.analyze

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TypeSniffSpec extends SparkSpec {

  test("inferTypes: narrowest lossless verdict per column; one bad value demotes") {
    import spark.implicits._
    val df = Seq(
      ("1", "1.5", "true", "2024-01-02", "2024-01-02 03:04:05", """{"k":1}""", "abc", "1"),
      ("-42", "2", "FALSE", "1999-12-31", "2024-01-02T03:04:05.123", """{}""", "2", "x"),
      ("+7", "-3e2", "True", "2024-06-07", "2024-06-07 00:00:00", """{"a":{"b":2}}""", null, "3"))
      .toDF("i", "f", "b", "d", "ts", "j", "s", "mixed")
    val out = TypeSniff.inferTypes(df, df.columns.toSeq).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(out("i").getAs[String]("verdict") === "bigint")
    assert(out("f").getAs[String]("verdict") === "double") // ints allowed, not all ints
    assert(out("b").getAs[String]("verdict") === "boolean")
    assert(out("d").getAs[String]("verdict") === "date")
    assert(out("ts").getAs[String]("verdict") === "timestamp")
    assert(out("j").getAs[String]("verdict") === "json")
    assert(out("s").getAs[String]("verdict") === "string")
    assert(out("mixed").getAs[String]("verdict") === "string") // one bad value demotes
    // null accounting: nulls don't block a verdict and are counted apart
    assert(out("s").getAs[Long]("n_values") === 2L)
    assert(out("s").getAs[Long]("n_null") === 1L)
    // int strings also count as numeric
    assert(out("i").getAs[Long]("n_num") === 3L)
  }

  test("inferTypes: all-null column is unknown; typed columns stringify losslessly") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("id", "empty")
    val out = TypeSniff.inferTypes(df, Seq("id", "empty")).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[String]("verdict")).toMap
    assert(out("id") === "bigint") // cast-to-string round-trips
    assert(out("empty") === "unknown")
  }
}
