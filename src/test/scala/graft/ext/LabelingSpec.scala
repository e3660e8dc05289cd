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

  test("calibrationReport: binning, exact ECE numerators, top-bin clamp") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val fp = 1048576L
    // conf exactly 1.0 must clamp into bin 9, not bin 10
    val preds = Seq(
      (fp, true),            // bin 9, perfectly confident and correct
      (fp / 2, true),        // bin 5 (conf 0.5)
      (fp / 2, false),       // bin 5
      (fp / 4, false),       // bin 2 (conf 0.25)
      (3L * fp / 4, true)    // bin 7 (conf 0.75)
    ).toDF("conf", "ok")
    val out = Labeling.calibrationReport(preds, col("conf"), col("ok"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(2L, 5L, 7L, 9L))
    // bin 9: n=1, correct=1, conf sum = 2^20 → gap 0, acc_fp = conf_avg_fp = 2^20
    assert(out(9L).getAs[Long]("gap_num") === 0L)
    assert(out(9L).getAs[Long]("acc_fp") === fp)
    // bin 5: n=2, correct=1, sum_conf = 2^20 → acc 0.5 == conf 0.5 → gap 0
    assert(out(5L).getAs[Long]("n") === 2L)
    assert(out(5L).getAs[Long]("gap_num") === 0L)
    assert(out(5L).getAs[Long]("acc_fp") === fp / 2)
    // bin 2: n=1, correct=0, sum_conf = 2^18 → gap = 2^18 (overconfident)
    assert(out(2L).getAs[Long]("gap_num") === fp / 4)
    assert(out(2L).getAs[Long]("acc_fp") === 0L)
    // bin 7: n=1, correct=1, sum_conf = 3·2^18 → gap = 2^18 (underconfident)
    assert(out(7L).getAs[Long]("gap_num") === fp / 4)
    // ECE numerator over all bins: 262144 (bin2) + 0 + 262144 (bin7) + 0;
    // ECE_fp = 524288 // 5 = 104857 ≈ 0.1
    val eceNum = out.values.map(_.getAs[Long]("gap_num")).sum
    assert(eceNum === 524288L)
  }

  test("rankAuc: separation, ties as midranks, degenerate labels") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def auc(rows: Seq[(Long, Boolean)]) =
      Labeling.rankAuc(rows.toDF("s", "y"), "s", col("y")).collect()(0)
    // perfect separation: positives all above negatives → AUC = 1
    val perfect = auc(Seq((1L, false), (2L, false), (3L, true), (4L, true)))
    assert(perfect.getAs[Long]("auc_fp") === 1048576L)
    // perfect inversion → AUC = 0
    assert(auc(Seq((9L, false), (1L, true))).getAs[Long]("auc_fp") === 0L)
    // all scores tied → midranks make AUC exactly 1/2
    val tied = auc(Seq((5L, true), (5L, false), (5L, true), (5L, false)))
    assert(tied.getAs[Long]("auc_fp") === 524288L)
    // hand case: scores 1,2,2,3 labels -,+,-,+ → ranks 1,2.5,2.5,4;
    // U = (2.5+4) − 2·3/2 = 3.5 of 4 → AUC = 7/8
    val hand = auc(Seq((1L, false), (2L, true), (2L, false), (3L, true)))
    assert(hand.getAs[Long]("u2_num") === 7L)
    assert(hand.getAs[Long]("u2_den") === 8L)
    assert(hand.getAs[Long]("auc_fp") === 7L * 1048576L / 8L)
    // degenerate: single class → auc_fp reported 0
    assert(auc(Seq((1L, true), (2L, true))).getAs[Long]("auc_fp") === 0L)
  }
}
