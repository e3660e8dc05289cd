package graft.ext

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("dot/cosine on known vectors") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(2.0f, 0.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Similarity.dot(col("a"), col("b")).as("ab"),
      Similarity.cosine(col("a"), col("c")).as("ac")).collect().head
    assert(r.getDouble(0) === 0.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("brute-force top-k: self excluded, ranks deterministic, k respected") {
    val emb = Tables.embeddings(spark, sf0001)
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 3)
    val byQuery = out.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQuery.values.foreach { rows =>
      assert(rows.length === 3)
      assert(!rows.exists(r => r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id")))
      // ranks 1..3 with non-increasing cosine
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
      val cs = sorted.map(_.getAs[Double]("cosine"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH top-k recalls a majority of brute-force top-3 neighbours") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val exact = Similarity.bruteForceTopK(emb, emb, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // On near-orthogonal random vectors, collision prob per table is
    // (1-θ/π)^planes ≈ 0.13 at 4 planes; 8 tables lifts recall past half.
    val approx = Similarity.lshTopK(emb, k = 3, numPlanes = 4, numTables = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall > 0.4, s"LSH recall too low: $recall")
  }

  test("IVF top-k recalls a majority of brute-force top-3 neighbours") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val exact = Similarity.bruteForceTopK(emb, emb, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8 cells over random vectors ≈ 1/8 of the corpus per cell; probing the
    // 3 nearest cells covers the true neighbours far more often than not.
    val approx = Similarity.ivfTopK(emb, k = 3, nlist = 8, nprobe = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall > 0.4, s"IVF recall too low: $recall")
  }

  test("trained IVF matches or beats the sampled quantizer's recall at equal probes") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val exact = Similarity.bruteForceTopK(emb, emb, k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val sampled = recall(Similarity.ivfTopK(emb, k = 3, nlist = 8, nprobe = 3))
    val trained = recall(Similarity.ivfTrainedTopK(emb, k = 3, nlist = 8, nprobe = 3))
    assert(trained > 0.4, s"trained IVF recall too low: $trained")
    // Lloyd refinement must not lose recall vs the raw sample (everything
    // here is deterministic, so this is a stable property, not a flake)
    assert(trained >= sampled - 0.02, s"trained $trained < sampled $sampled")
  }

  test("trained IVF centroids differ from the init sample and keep ranks well-formed") {
    val emb = Tables.embeddings(spark, sf0001)
    val trained = Similarity.ivfTrainedTopK(emb, k = 3, nlist = 8, nprobe = 2)
    val sampled = Similarity.ivfTopK(emb, k = 3, nlist = 8, nprobe = 2)
    // training moved the quantizer: assignments (and thus some neighbour
    // sets) change
    val t = trained.select("query_id", "neighbor_id").collect().toSet
    val s0 = sampled.select("query_id", "neighbor_id").collect().toSet
    assert(t !== s0)
    val byQuery = trained.collect().groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach { rows =>
      assert(rows.length <= 3)
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to rows.length))
    }
  }

  test("IVF search space is cell-bounded: every query probes nprobe cells") {
    val emb = Tables.embeddings(spark, sf0001)
    val out = Similarity.ivfTopK(emb, k = 3, nlist = 8, nprobe = 2)
    // per-query candidate count < corpus size (never brute force) and ranks
    // are well-formed
    val byQuery = out.collect().groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach { rows =>
      assert(rows.length <= 3)
      val ranks = rows.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks === (1 to rows.length))
    }
  }

  test("int8 quantization: exact values on a known vector, bounded roundtrip error") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, -0.5f, 0.25f)), (2L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("scale"), r.getAs[Seq[Int]]("qvec"))).toMap
    assert(q(1L)._1 === 127.0)
    assert(q(1L)._2 === Seq(127, -63, 32)) // floor(x*127 + 0.5)
    assert(q(2L)._1 === 1.0) // zero vector: scale fallback, no div-by-zero
    assert(q(2L)._2 === Seq(0, 0, 0))
    // roundtrip on real embeddings: |dequant - x| <= 0.5/scale everywhere
    val emb = Tables.embeddings(spark, sf0001)
    val bad = Similarity.quantizeInt8(emb)
      .join(emb, "vec_id")
      .select(aggregate(
        zip_with(Similarity.dequantize(col("qvec"), col("scale")), col("embedding"),
          (dq, x) => abs(dq - x.cast("double")) - lit(0.5) / col("scale")),
        lit(0.0), (acc, d) => greatest(acc, d)).as("worst"))
      .filter(col("worst") > 1e-9).count()
    assert(bad === 0L, "quantization error above half a quantization step")
  }

  test("cosinePairsAbove is symmetric-free (a<b) and thresholded") {
    val emb = Tables.embeddings(spark, sf0001)
    val rows = Similarity.cosinePairsAbove(emb, 0.35).collect()
    assert(rows.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(rows.forall(r => r.getAs[Double]("cosine") >= 0.35))
  }

  test("LSH pair path equals the exact cross-product path at threshold 0.35") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cosine"))
    val exact = Similarity.cosinePairsAbove(emb, 0.35).collect().map(key).toSet
    val lsh = Similarity.cosinePairsAboveLsh(emb, 0.35).collect().map(key).toSet
    assert(lsh === exact) // precision exact by construction; recall tuned to 1.0
  }

  test("centroidClassify: separable clusters give a diagonal confusion matrix") {
    import spark.implicits._
    // two clean clusters on orthogonal axes + one vector leaning the wrong way
    val rows = Seq(
      (1L, Array(1.0f, 0.1f, 0f, 0f), 0),
      (2L, Array(0.9f, 0.2f, 0f, 0f), 0),
      (3L, Array(0.1f, 1.0f, 0f, 0f), 1),
      (4L, Array(0.2f, 0.9f, 0f, 0f), 1),
      (5L, Array(0.9f, 0.1f, 0f, 0f), 1) // labeled 1, sits in cluster 0
    ).toDF("vec_id", "embedding", "label")
    val cm = Similarity.centroidClassify(rows).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("predicted")) -> r.getAs[Long]("n"))
      .toMap
    assert(cm((0, 0)) === 2L)
    assert(cm((1, 1)) === 2L)
    assert(cm((1, 0)) === 1L) // the mislabeled vector is caught
    assert(!cm.contains((0, 1)))
  }

  test("recallAtK: per-query intersection over k, zero-hit queries kept") {
    import spark.implicits._
    val exact = Seq(
      (1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L), (3L, 31L)
    ).toDF("query_id", "neighbor_id")
    val approx = Seq(
      (1L, 10L), (1L, 11L), // both right
      (2L, 20L), (2L, 99L), // one right
      (3L, 98L), (3L, 99L)  // none right
    ).toDF("query_id", "neighbor_id")
    val out = Similarity.recallAtK(exact, approx, k = 2).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Double]("recall"))).toMap
    assert(out === Map(1L -> ((2L, 1.0)), 2L -> ((1L, 0.5)), 3L -> ((0L, 0.0))))
  }

  test("IVF recall sweep: more probes never lose recall (the tuning loop)") {
    val emb = Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
    def meanRecall(nprobe: Int): Double = {
      val approx = Similarity.ivfTopK(emb, k = 5, nprobe = nprobe)
        .filter(col("query_id") < 10)
      Similarity.recallAtK(exact, approx, k = 5)
        .agg(avg("recall")).collect().head.getDouble(0)
    }
    val r2 = meanRecall(2)
    val r8 = meanRecall(8)
    assert(r2 > 0.0 && r2 <= 1.0, s"recall@5 nprobe=2 = $r2")
    // probing more cells only grows the candidate set → recall is monotone
    assert(r8 >= r2, s"nprobe=8 recall $r8 < nprobe=2 recall $r2")
    assert(r8 > 0.5, s"8 of 16 cells probed should recover most neighbours, got $r8")
  }

  test("multiProbeTopK: probes=1 is the plain one-table LSH; more probes only help") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // probes=1 probes only the base bucket — exactly lshTopK with one table
    val single = pairs(Similarity.multiProbeTopK(emb, k = 5, probes = 1))
    assert(single === pairs(Similarity.lshTopK(emb, k = 5, numTables = 1)))
    // flipping low-margin bits only ADDS candidates → recall vs brute
    // force is non-decreasing in probes
    val truth = Similarity.bruteForceTopK(emb, emb, k = 5)
      .select("query_id", "neighbor_id")
    def recall(probes: Int): Long = Similarity
      .multiProbeTopK(emb, k = 5, probes = probes)
      .select("query_id", "neighbor_id")
      .join(truth, Seq("query_id", "neighbor_id")).count()
    val rs = Seq(1, 3, 5).map(recall)
    assert(rs.zip(rs.tail).forall { case (a, b) => a <= b },
      s"recall hits must be non-decreasing in probes: $rs")
    assert(rs.last > rs.head,
      s"probing low-margin flips should recover extra true neighbors: $rs")
  }

  test("mmrSelect: diversity reorders a redundant result list") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),   // query
      (1L, Seq(0.9f, 0.1f)),   // best relevance
      (2L, Seq(0.9f, 0.11f)),  // near-duplicate of 1
      (3L, Seq(0.5f, -0.5f)),  // mid relevance, diverse
      (4L, Seq(0.0f, 1.0f)))   // low relevance, most diverse
      .toDF("vec_id", "embedding")
    // λ = 3/10 weights diversity: the orthogonal doc (max-sim 0.11) beats
    // the mid-relevance one (max-sim 0.62), and the near-dup of the first
    // pick drops last — hand-checked mmr values
    val picked = Similarity.mmrSelect(emb, queryId = 0L, k = 4, lamNum = 3)
      .orderBy("step").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(picked === Seq(1L, 4L, 3L, 2L))
    // pure relevance (λ = 1) is plain cosine order — the near-dup second
    val byRel = Similarity.mmrSelect(emb, queryId = 0L, k = 4, lamNum = 10)
      .orderBy("step").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(byRel === Seq(1L, 2L, 3L, 4L))
    // k beyond the candidate count returns everything, no crash
    val all = Similarity.mmrSelect(emb, queryId = 0L, k = 50, lamNum = 3)
      .collect()
    assert(all.length === 4)
    assert(all.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L, 3L, 4L))
  }

  test("cosineThresholdSweep: complete partition of the subsample pair square") {
    import graft.ext.Dedup
    val emb = Tables.embeddings(spark, sf0001)
    val out = Similarity.cosineThresholdSweep(emb, pct = 50, bins = 20)
      .collect().sortBy(_.getAs[Long]("bin"))
    assert(out.map(_.getAs[Long]("bin")).toSeq === (0L until 20L))
    assert(out.head.getAs[Long]("thr_lo_fp") === -1048576L)
    assert(out(10).getAs[Long]("thr_lo_fp") === 0L)
    // every subsample pair lands in exactly one bin
    val nSub = emb.filter(
      pmod(Dedup.stableHash(col("vec_id").cast("string"), 7), lit(100L)) < 50).count()
    assert(out.map(_.getAs[Long]("n_pairs")).sum === nSub * (nSub - 1) / 2)
    assert(out.forall(r => r.getAs[Long]("n_docs") <= nSub))
    assert(out.map(_.getAs[Long]("n_pairs")).sum > 0L)
  }

  test("cosineThresholdSweep: zero-norm vectors are excluded, not silently lost to NaN bins") {
    import spark.implicits._
    // 4 unit-ish vectors + 1 zero vector, pct=100 so all are sampled
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f))) // zero norm: cosine undefined
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineThresholdSweep(emb, pct = 100, bins = 4).collect()
    // the pair square is over the 4 NONZERO vectors — complete, no NaN loss
    assert(out.map(_.getAs[Long]("n_pairs")).sum === 4L * 3 / 2)
    assert(out.forall(r => r.getAs[Long]("n_docs") <= 4L))
  }

  test("ivfOperatingCurve: recall and cost non-decreasing in nprobe; full probe is exact") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val out = Similarity.ivfOperatingCurve(
        emb, k = 5, nlist = 8, nprobes = Seq(1, 2, 4, 8), nQueries = 10)
      .collect().sortBy(_.getAs[Long]("nprobe"))
    assert(out.map(_.getAs[Long]("nprobe")).toSeq === Seq(1L, 2L, 4L, 8L))
    assert(out.forall(_.getAs[Long]("n_queries") === 10L))
    // more probes only grow the candidate set → recall AND cost are monotone
    val recalls = out.map(_.getAs[Long]("recall_fp"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall_fp must be non-decreasing in nprobe: ${recalls.toSeq}")
    val costs = out.map(_.getAs[Long]("n_candidates"))
    assert(costs.zip(costs.tail).forall { case (a, b) => a <= b },
      s"n_candidates must be non-decreasing in nprobe: ${costs.toSeq}")
    // probing every cell scores the whole corpus: recall@5 = 1 exactly and
    // the candidate count is the full brute-force space
    assert(recalls.last === 1048576L)
    val n = emb.count()
    assert(costs.last === 10L * (n - 1))
  }

  test("semanticDedup: one row per vector, cell-contained clusters, min-id canonical") {
    val emb = Tables.embeddings(spark, sf0001)
    val n = emb.count()
    val out = Similarity.semanticDedup(emb, tau = 0.3).collect()
    assert(out.length === n)
    // canonical = component min, and exactly the keepers carry their own id
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getAs[Long]("vec_id")).min === cid)
      assert(members.count(_.getAs[Boolean]("keep")) === 1)
      assert(members.find(_.getAs[Boolean]("keep")).get.getAs[Long]("vec_id") === cid)
      // edges are intra-cell only, so every cluster lives in one cell
      assert(members.map(_.getAs[Int]("cell")).toSet.size === 1)
    }
  }

  test("semanticDedup clusters cover every same-cell pair above tau") {
    val emb = Tables.embeddings(spark, sf0001)
    val out = Similarity.semanticDedup(emb, tau = 0.3)
    val cells = out.select(col("vec_id"), col("cell"), col("cluster_id"))
    val pairs = Similarity.cosinePairsAbove(emb, 0.3)
      .join(cells.select(col("vec_id").as("id_a"), col("cell").as("cell_a"),
        col("cluster_id").as("cl_a")), Seq("id_a"))
      .join(cells.select(col("vec_id").as("id_b"), col("cell").as("cell_b"),
        col("cluster_id").as("cl_b")), Seq("id_b"))
      .filter(col("cell_a") === col("cell_b"))
      .collect()
    assert(pairs.nonEmpty, "expected at least one same-cell pair above tau at sf0.001")
    pairs.foreach { r =>
      assert(r.getAs[Long]("cl_a") === r.getAs[Long]("cl_b"),
        s"same-cell pair above tau split across clusters: $r")
    }
  }

  test("hardNegatives: labels always differ, no self, ranks contiguous per query") {
    val emb = Tables.embeddings(spark, sf0001)
    val out = Similarity.hardNegatives(emb, k = 3).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("query_label") !== r.getAs[Int]("neighbor_label"))
      assert(r.getAs[Long]("query_id") !== r.getAs[Long]("neighbor_id"))
    }
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      val ranks = rows.map(_.getAs[Int]("rank")).sorted
      assert(ranks.head === 1 && ranks === (1 to ranks.length).toList.sorted)
      assert(ranks.length <= 3)
      // ranks follow cosine descending
      val byRank = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(byRank === byRank.sorted.reverse)
    }
  }

  test("diverseSelect: per-cell cap holds, ranks contiguous, uncapped run covers corpus") {
    val emb = Tables.embeddings(spark, sf0001)
    val n = emb.count()
    // cap far above corpus size ⇒ every vector selected exactly once
    val all = Similarity.diverseSelect(emb, perCell = 10000)
    assert(all.count() === n)
    assert(all.select("vec_id").distinct().count() === n)
    val capped = Similarity.diverseSelect(emb, perCell = 2).collect()
    capped.groupBy(_.getAs[Long]("cell")).values.foreach { rows =>
      assert(rows.length <= 2)
      assert(rows.map(_.getAs[Long]("rank")).sorted === (1L to rows.length).toList)
    }
    // the capped selection spans every populated cell of the full assignment
    val allCells = all.select("cell").distinct().collect().map(_.getLong(0)).toSet
    assert(capped.map(_.getAs[Long]("cell")).toSet === allCells,
      "every populated cell contributes to the diverse selection")
  }

  test("jlProject: deterministic signs, exact fp dots, sign flip negates") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 4-dim vectors, 2 output dims — hand-check against jlSigns
    val signs = Similarity.jlSigns(11, 4, 2)
    val v = Seq(1.0f, 2.0f, -3.0f, 0.5f)
    val corpus = Seq((1L, v), (2L, v.map(x => -x)))
      .toDF("vec_id", "embedding")
    val out = Similarity.jlProject(corpus, outDim = 2, inDim = 4, seed = 11)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dim")) -> r.getAs[Long]("proj_fp"))
      .toMap
    (0 until 2).foreach { j =>
      var dot = 0.0
      v.indices.foreach(i => dot += v(i).toDouble * signs(j)(i))
      assert(out((1L, j.toLong)) === math.floor(dot * 1048576.0).toLong)
      assert(out((2L, j.toLong)) === math.floor(-dot * 1048576.0).toLong)
    }
    // signs are ±1 only and deterministic across calls
    assert(signs.flatten.forall(s => s == 1.0 || s == -1.0))
    assert(signs === Similarity.jlSigns(11, 4, 2))
    assert(signs !== Similarity.jlSigns(12, 4, 2), "seed changes the matrix")
  }

  test("ivfOccupancy: shares sum to ~1, counts cover the corpus, cells match assignment") {
    val emb = Tables.embeddings(spark, sf0001)
    val out = Similarity.ivfOccupancy(emb).collect()
    assert(out.map(_.getAs[Long]("n_vecs")).sum === emb.count())
    val shareSum = out.map(_.getAs[Long]("share_fp")).sum
    // floors can undershoot by at most one per cell
    assert(shareSum <= 1048576L && shareSum > 1048576L - out.length)
    // occupancy cells agree with the silhouette report's partition
    val silCells = Similarity.silhouetteReport(emb).collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n")).toMap
    out.foreach { r =>
      assert(silCells(r.getAs[Long]("cell")) === r.getAs[Long]("n_vecs"))
    }
  }

  test("silhouetteReport: cells partition the corpus; sil bounded; tight cells score high") {
    val emb = Tables.embeddings(spark, sf0001)
    val rep = Similarity.silhouetteReport(emb).collect()
    // every vector lands in exactly one cell
    assert(rep.map(_.getAs[Long]("n")).sum === emb.count())
    rep.foreach { r =>
      val mean = r.getAs[Long]("mean_sil_fp")
      val min = r.getAs[Long]("min_sil_fp")
      val n = r.getAs[Long]("n")
      val nLow = r.getAs[Long]("n_low")
      // centroid-form silhouette is within [0, 1] in fixed point
      assert(min >= 0L && mean <= 1048576L, s"sil out of range: $r")
      assert(min <= mean)
      assert(nLow >= 0L && nLow <= n)
    }
  }
}
