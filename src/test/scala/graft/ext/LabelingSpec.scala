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
}
