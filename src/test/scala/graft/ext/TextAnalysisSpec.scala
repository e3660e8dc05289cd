package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private def one(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("token count and occurrences") {
    val df = one("a b c a b a")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.countOccurrences(concat(lit(" "), col("text"), lit(" ")), " a ").as("na"))
      .collect().head
    assert(r.getInt(0) === 6)
    assert(r.getDouble(1) === 3.0)
  }

  test("language id picks the language with most marker hits") {
    val en = one("the cat sat on the mat and the dog is here")
    val de = one("der hund und die katze ist das haus")
    assert(en.select(TextAnalysis.langId(col("text"))).head.getString(0) === "en")
    assert(de.select(TextAnalysis.langId(col("text"))).head.getString(0) === "de")
    assert(one("xyzzy plugh").select(TextAnalysis.langId(col("text"))).head.getString(0) === "und")
  }

  test("quality metrics ranges and fingerprint invariance") {
    val df = TextAnalysis.withQualityMetrics(one("Hello world this is a decent sentence"))
    val r = df.select("alpha_ratio", "quality_score").collect().head
    assert(r.getDouble(0) > 0.7 && r.getDouble(0) < 1.0)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)

    val fp1 = one("Hello, World!").select(TextAnalysis.fingerprint(col("text"))).head.getString(0)
    val fp2 = one("hello world").select(TextAnalysis.fingerprint(col("text"))).head.getString(0)
    assert(fp1 === fp2) // punctuation/case-invariant
  }
}
