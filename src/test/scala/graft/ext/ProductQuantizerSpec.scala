package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {

  private def embeddings = spark.read
    .parquet(s"$sf0001/embeddings.parquet")

  test("encode assigns each subspace to its nearest codebook entry") {
    import spark.implicits._
    // 4-dim vectors, 2 subspaces of 2 dims; two clean clusters per subspace
    val df = Seq(
      (1L, Seq(0f, 0f, 10f, 10f)),
      (2L, Seq(0.1f, 0f, 10f, 10.1f)),
      (3L, Seq(5f, 5f, 0f, 0f)),
      (4L, Seq(5.1f, 5f, 0.1f, 0f)))
      .toDF("vec_id", "embedding")
    val books = ProductQuantizer.train(df, m = 2, k = 2, iters = 2, dim = 4)
    val out = ProductQuantizer.encode(df, books, dim = 4)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    // rows 1/2 share both subspace cells; rows 3/4 share the OTHER cells
    assert(out(1L) === out(2L))
    assert(out(3L) === out(4L))
    assert(out(1L)(0) !== out(3L)(0))
    assert(out(1L)(1) !== out(3L)(1))
  }

  test("ADC top-k finds the near-duplicate first") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def vec() = Seq.fill(8)(rng.nextFloat())
    val base = (1L to 40L).map(i => (i, vec()))
    // md5-smallest ids seed queries; give every query a planted near-dup
    val df = (base ++ base.map { case (i, v) =>
      (i + 100L, v.map(x => x + 0.001f))
    }).toDF("vec_id", "embedding")
    // ADC distance depends only on the neighbor's CODES, so vectors in the
    // same cells tie exactly and rank by id — the twin need not be rank 1.
    // The invariant: the planted twin quantizes into the query's own cells,
    // so its adist equals the per-query MINIMUM.
    val out = ProductQuantizer.pqTopK(df, k = 100, m = 2, numCodes = 4,
      iters = 2, numQueries = 3, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byQuery = out.groupBy(_._1)
    assert(byQuery.size === 3)
    byQuery.foreach { case (q, rows) =>
      val twin = if (q > 100L) q - 100L else q + 100L
      val twinDist = rows.find(_._2 == twin).map(_._3)
      val minDist = rows.map(_._3).min
      assert(twinDist.contains(minDist),
        s"query $q: twin adist $twinDist != min $minDist")
    }
  }

  test("pqOperatingCurve: one row per m, recall in [0,1], finer codes beat coarser") {
    val out = ProductQuantizer.pqOperatingCurve(
        embeddings.cache(), ms = Seq(2, 4, 8), k = 5, numQueries = 10)
      .collect().sortBy(_.getAs[Long]("m"))
    assert(out.map(_.getAs[Long]("m")).toSeq === Seq(2L, 4L, 8L))
    assert(out.forall(_.getAs[Long]("n_queries") === 10L))
    out.foreach { r =>
      val (hits, fp) = (r.getAs[Long]("sum_hits"), r.getAs[Long]("recall_fp"))
      assert(hits >= 0L && hits <= 50L)
      assert(fp >= 0L && fp <= 1048576L)
      assert(fp === hits * 1048576L / 50L)
    }
    // the curve's reason to exist: more subspaces = lower ADC distortion.
    // Endpoint comparison only (mid-curve can wobble on a small corpus).
    assert(out.last.getAs[Long]("sum_hits") >= out.head.getAs[Long]("sum_hits"),
      s"m=8 should recall at least as much as m=2: ${out.toSeq}")
  }

  test("sq8ErrorAudit: range endpoints reconstruct exactly; flat vectors are lossless; interior error matches the replicated arithmetic") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.0f, 1.0f)),            // endpoints only: q=0 and q=255 exact
      (2L, Array(3.5f, 3.5f, 3.5f)),      // flat range: lossless by definition
      (3L, Array(0.0f, 0.5f, 1.0f)))      // interior value pays quantization
      .toDF("vec_id", "embedding")
    val out = ProductQuantizer.sq8ErrorAudit(vecs)
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(out(1L).getAs[Long]("err_fp") === 0L)
    assert(out(2L).getAs[Long]("err_fp") === 0L)
    assert(out(2L).getAs[Long]("n_dims") === 3L)
    // replicate the exact IEEE chain for the interior dim of vector 3
    val (mn, mx) = (0.0, 1.0)
    val scale = (mx - mn) / 255.0
    val q = math.min(math.floor((0.5 - mn) / scale + 0.5), 255.0)
    val diff = 0.5 - (mn + q * scale)
    val expected = math.floor(diff * diff * 1048576.0).toLong
    assert(out(3L).getAs[Long]("err_fp") === expected)
    assert(out(3L).getAs[Long]("max_abs_err_fp") ===
      math.floor(math.abs(diff) * 1048576.0).toLong)
  }

  test("two-stage top-k equals single-stage (salting is invisible)") {
    val a = ProductQuantizer.pqTopK(embeddings, k = 5, numQueries = 4, salts = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val b = ProductQuantizer.pqTopK(embeddings, k = 5, numQueries = 4, salts = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(a === b)
    assert(a.size === 20)
  }
}
