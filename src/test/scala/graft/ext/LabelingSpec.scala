package graft.ext

import graft.SparkSpec

class LabelingSpec extends SparkSpec {

  test("consensus: majority with deterministic tiebreak, tie and unanimity flags, null abstains") {
    import spark.implicits._
    val votes = Seq(
      (1L, "cat"), (1L, "cat"), (1L, "dog"),            // clear majority
      (2L, "cat"), (2L, "dog"),                         // tie — tiebreak picks 'cat'
      (3L, "bird"), (3L, "bird"),                       // unanimous
      (4L, "x"), (4L, null.asInstanceOf[String])        // null is an abstention
    ).toDF("item", "label")
    val out = Labeling.consensus(votes, "item", "label").collect()
      .map(r => r.getAs[Long]("item") -> r).toMap
    assert(out(1L).getAs[String]("majority_label") === "cat")
    assert(out(1L).getAs[Long]("n_votes") === 3L)
    assert(out(1L).getAs[Long]("majority_votes") === 2L)
    assert(!out(1L).getAs[Boolean]("is_tie"))
    assert(!out(1L).getAs[Boolean]("unanimous"))
    assert(out(2L).getAs[String]("majority_label") === "cat") // lowest label wins ties
    assert(out(2L).getAs[Boolean]("is_tie"))
    assert(out(3L).getAs[Boolean]("unanimous"))
    assert(!out(3L).getAs[Boolean]("is_tie"))
    assert(out(4L).getAs[Long]("n_votes") === 1L) // the null vote never counted
    assert(out(4L).getAs[Long]("n_distinct_labels") === 1L)
  }

  test("agreementKappa: hand-computed confusion, perfect and degenerate cases") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // n=4, agree=2; marginals a: x=2,y=2  b: x=3,y=1
    // pe_num = 2*3 + 2*1 = 8; num = 4*2-8 = 0; den = 16-8 = 8; kappa = 0
    val d = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("y", "y"), (null, "x"))
      .toDF("a", "b")
    val r = Labeling.agreementKappa(d, col("a"), col("b")).collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("agree_n") === 2L)
    assert(r.getAs[Long]("pe_num") === 8L)
    assert(r.getAs[Long]("kappa_num") === 0L)
    assert(r.getAs[Long]("kappa_den") === 8L)
    assert(r.getAs[Long]("kappa_fp") === 0L)

    // perfect agreement over 2+ labels → kappa_fp = 2^20 exactly
    val p = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    assert(Labeling.agreementKappa(p, col("a"), col("b"))
      .collect()(0).getAs[Long]("kappa_fp") === 1048576L)

    // degenerate: both sides constant → den 0 → reported as 0
    val c = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val rc = Labeling.agreementKappa(c, col("a"), col("b")).collect()(0)
    assert(rc.getAs[Long]("kappa_den") === 0L)
    assert(rc.getAs[Long]("kappa_fp") === 0L)

    // systematic disagreement: negative kappa floors toward -1
    val neg = Seq(("x", "y"), ("y", "x")).toDF("a", "b")
    val rn = Labeling.agreementKappa(neg, col("a"), col("b")).collect()(0)
    // n=2 agree=0; pe = 1*1+1*1 = 2; num = -2; den = 2 → kappa = -1
    assert(rn.getAs[Long]("kappa_fp") === -1048576L)
  }
}
