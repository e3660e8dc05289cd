package graft.ext

import graft.SparkSpec

class EmbeddingStatsSpec extends SparkSpec {

  test("normOutliers: a wild-norm vector is flagged, tight clusters are clean") {
    import spark.implicits._
    // label 0: nine unit-ish vectors + one at 100× the norm
    // label 1: all identical norms → zero variance → no outliers
    val rows =
      ((1 to 9).map(i => (i.toLong, Array(1.0f, 0f), 0)) :+
        (100L, Array(100.0f, 0f), 0)) ++
        (1 to 5).map(i => (200L + i, Array(0f, 2.0f), 1))
    val out = EmbeddingStats.normOutliers(rows.toDF("vec_id", "embedding", "label"))
      .collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Long]("n_outliers"),
          r.getAs[Double]("mean_norm"))).toMap
    assert(out(0)._1 === 10L)
    assert(out(0)._2 === 1L) // only the 100× vector trips |z| > 2
    assert(out(0)._3 > 1.0 && out(0)._3 < 100.0) // mean dragged up by the outlier
    assert(out(1) === ((5L, 0L, 2.0)))
  }

  test("dimensionProfile: exact per-position means and ranges") {
    import spark.implicits._
    val df = Seq(
      Tuple1(Array(1.0f, -2.0f)),
      Tuple1(Array(3.0f, 0.0f))).toDF("embedding")
    val out = EmbeddingStats.dimensionProfile(df).collect()
      .map(r => r.getAs[Int]("pos") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean_v"),
          r.getAs[Double]("min_v"), r.getAs[Double]("max_v")))).toMap
    assert(out(0) === ((2L, 2.0, 1.0, 3.0)))
    assert(out(1) === ((2L, -1.0, -2.0, 0.0)))
  }

  test("topPrincipalDirection: dominant axis resolves to the max component") {
    import spark.implicits._
    // energy concentrated on axis 0 (|2|,|3|), a little on axis 1, none on 2/3
    val df = Seq(
      Seq(2.0f, 0.0f, 0.0f, 0.0f),
      Seq(3.0f, 0.0f, 0.0f, 0.0f),
      Seq(0.0f, 1.0f, 0.0f, 0.0f)
    ).toDF("embedding")
    val v = EmbeddingStats.topPrincipalDirection(df, dim = 4).collect()
      .map(r => r.getAs[Long]("pos") -> r.getAs[Long]("v_fp")).toMap
    // the dominant component normalizes to exactly 2^20
    assert(v(0L) === 1048576L)
    // the weak axis decays by (G11/G00)^3 — far below 1% of the max
    assert(math.abs(v(1L)) < 10486L)
    assert(v(2L) === 0L && v(3L) === 0L)
    // determinism: same input, same vector
    val again = EmbeddingStats.topPrincipalDirection(df, dim = 4).collect()
      .map(r => r.getAs[Long]("pos") -> r.getAs[Long]("v_fp")).toMap
    assert(again === v)
  }

  test("anisotropyScore: one-axis corpus near 1, balanced axes near 1/dim") {
    import spark.implicits._
    // all energy on one axis → anisotropy ≈ 1
    val mono = Seq(
      Seq(2.0f, 0.0f), Seq(3.0f, 0.0f), Seq(1.0f, 0.0f)).toDF("embedding")
    val a1 = EmbeddingStats.anisotropyScore(mono, dim = 2).collect()(0)
    assert(a1.getAs[Long]("anisotropy_fp") > 1000000L, "single axis ≈ 2^20")
    // equal energy on two orthogonal axes → top direction owns ~half
    val iso = Seq(
      Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(-1.0f, 0.0f), Seq(0.0f, -1.0f))
      .toDF("embedding")
    val a2 = EmbeddingStats.anisotropyScore(iso, dim = 2).collect()(0)
    val half = a2.getAs[Long]("anisotropy_fp")
    assert(half > 400000L && half < 700000L, s"balanced axes ≈ 1/2, got $half")
    // trace is the exact quantized second-moment sum
    assert(a1.getAs[Long]("trace") === (2048L * 2048 + 3072L * 3072 + 1024L * 1024))
  }

  test("centroidShift: aligned groups at cosine 1, opposed at -1, orthogonal at 0") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(3.0f, 0.0f)),   // centroid (2, 0)
      (1, Seq(-2.0f, 0.0f)),                        // centroid (-2, 0)
      (2, Seq(0.0f, 5.0f))                          // centroid (0, 5)
    ).toDF("label", "embedding")
    val out = EmbeddingStats.centroidShift(df).collect()
      .map(r => (r.getAs[Long]("group_a"), r.getAs[Long]("group_b")) ->
        r.getAs[Long]("cosine_fp")).toMap
    assert(out((0L, 1L)) === -1048576L)
    assert(out((0L, 2L)) === 0L)
    assert(out((1L, 2L)) === 0L)
    assert(out.size === 3)
  }

  test("allButTopAudit: deflation moves the share to the second direction") {
    import spark.implicits._
    val dim = 8
    def vec(pos: Int) = Array.tabulate(dim)(i => if (i == pos) 1.0f else 0.0f)
    // 20 vectors on e0, 2 on e1: big eigengap (λ2/λ1 = 1/10) so three
    // power iterations converge tightly; top share ≈ 20/22 of the trace,
    // and the deflated space is essentially pure e1 (residual ≈ 1)
    val corpus = (
      (1 to 20).map(i => (i.toLong, vec(0))) ++
      (21 to 22).map(i => (i.toLong, vec(1)))
    ).toDF("vec_id", "embedding")
    val r = EmbeddingStats.allButTopAudit(corpus, dim = dim).collect().head
    assert(r.getAs[Long]("trace") === 22L * 1024 * 1024)
    val top = r.getAs[Long]("top_share_fp")
    val res = r.getAs[Long]("residual_share_fp")
    assert(math.abs(top - (20L * 1048576 / 22)) <= 2048, s"top=$top")
    // imperfect convergence leaves a whisker above/below exactly 1.0
    assert(math.abs(res - 1048576L) <= 4096, s"res=$res")
  }

  test("allButTopAudit: fully symmetric corpus degenerates safely (mx=0 guard)") {
    import spark.implicits._
    val dim = 4
    // one unit vector per axis: G = a·I. The all-ones iterate is an exact
    // eigenvector, so top share is exactly 1/dim; the deflated matrix
    // annihilates the all-ones start (D'·1 = 0), exercising the mx = 0
    // keep-previous guard, and the residual reports 0 rather than NaN/crash.
    val corpus = (0 until dim).map { p =>
      (p.toLong, Array.tabulate(dim)(i => if (i == p) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val r = EmbeddingStats.allButTopAudit(corpus, dim = dim).collect().head
    assert(r.getAs[Long]("top_share_fp") === 1048576L / dim)
    assert(r.getAs[Long]("residual_share_fp") === 0L)
  }
}
