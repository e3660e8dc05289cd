package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    // target talks about "alpha beta"; raw docs 10/11 echo the target
    // vocabulary, 12/13 do not.
    Seq(
      (1L, "alpha beta alpha beta", "target"),
      (2L, "alpha beta gamma", "target"),
      (10L, "alpha beta alpha beta alpha beta", "raw"),
      (11L, "alpha delta delta delta", "raw"),
      (12L, "omega omega omega omega omega omega", "raw"),
      (13L, "zeta eta theta iota", "raw")).toDF("doc_id", "text", "source")
  }

  test("target-like raw documents outscore off-domain ones; order deterministic") {
    val out = Importance.importanceSelect(
      docs, col("source") === "target", nBuckets = 64, k = 4).collect()
    val ids = out.map(_.getAs[Long]("doc_id"))
    val score = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score")).toMap
    assert(ids.head === 10L) // densest target-vocabulary doc wins
    assert(score(10L) > score(12L) && score(11L) > score(12L))
    // rows arrive in (score desc, id asc) order
    assert(ids === ids.sortBy(id => (-score(id), id)))
  }

  test("weights are add-one-smoothed integer ratios; unseen buckets default low") {
    val target = docs.filter(col("source") === "target")
    val raw = docs.filter(col("source") =!= "target")
    val w = Importance.featureWeights(target, raw, nBuckets = 64).collect()
    val scale = 1L << 20
    w.foreach { r =>
      val (t, rf, wgt) = (r.getAs[Long]("t_f"), r.getAs[Long]("r_f"), r.getAs[Long]("w"))
      assert(wgt === (t + 1) * scale / (rf + 1)) // exact fixed-point ratio
    }
    // a bucket seen only in raw gets the minimal smoothed weight
    val rawOnly = w.filter(r => r.getAs[Long]("t_f") == 0L)
    assert(rawOnly.nonEmpty)
    rawOnly.foreach(r => assert(r.getAs[Long]("w") === scale / (r.getAs[Long]("r_f") + 1)))
  }

  test("scoring joins a broadcast weight table (no data-scale shuffle on features)") {
    val plan = Importance.importanceSelect(
      docs, col("source") === "target").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
