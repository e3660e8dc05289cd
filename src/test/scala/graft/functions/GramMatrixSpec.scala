package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GramMatrixSpec extends SparkSpec {

  test("gramProfile: hand-computed 2-dim corpus, symmetric layout decode") {
    import spark.implicits._
    // q = floor(v·1024): (1024, 2048), (-512, 1024)  [from 1.0,2.0 / -0.5,1.0]
    val df = Seq(
      Tuple1(Seq(1.0f, 2.0f)),
      Tuple1(Seq(-0.5f, 1.0f))
    ).toDF("embedding")
    val out = graft.ext.EmbeddingStats.gramProfile(df, dim = 2).collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("g_sum")))).toMap
    // G(0,0) = 1024² + 512² ; G(0,1) = 1024·2048 − 512·1024 ; G(1,1) = 2048² + 1024²
    assert(out((0, 0)) === ((2L, 1024L * 1024 + 512L * 512)))
    assert(out((0, 1)) === ((2L, 1024L * 2048 - 512L * 1024)))
    assert(out((1, 1)) === ((2L, 2048L * 2048 + 1024L * 1024)))
    assert(out.size === 3)
  }

  test("gram aggregate merges like a single pass (partial aggregation safe)") {
    import spark.implicits._
    val vecs = (1 to 50).map(i => Tuple1(Seq(i.toFloat / 7f, -i.toFloat / 11f, i.toFloat)))
    val one = graft.ext.EmbeddingStats.gramProfile(vecs.toDF("embedding").coalesce(1), dim = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("g_sum")).toMap
    val many = graft.ext.EmbeddingStats.gramProfile(vecs.toDF("embedding").repartition(13), dim = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("g_sum")).toMap
    assert(one === many)
  }
}
