package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (north-star extension):
  * brute-force cosine top-k as the exact baseline, and an LSH-bucketed
  * (random-hyperplane sign) variant as the 100 TB scale path.
  *
  * Vectors are `Array[Float]` columns; all arithmetic is promoted to double
  * inside `aggregate`/`zip_with` (codegen'd higher-order functions — no UDF,
  * no serialization off the Tungsten format).
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double with a
    * fixed left-to-right fold (deterministic, engine-portable).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Project (id, vector, norm) once per row, so the pairwise stage does ONE
    * native dot product per pair instead of recomputing casts and norms —
    * the quadratic inner loop is a codegen'd primitive loop
    * (graft.functions.DotProduct), no per-pair allocation. The cosine value
    * (dot / (normA·normB)) is bit-identical to the higher-order
    * formulation: same element order, same double accumulation.
    */
  private def prepared(df: DataFrame, idCol: String, vecCol: String,
      idAlias: String, vecAlias: String, nrmAlias: String): DataFrame = {
    val spark = df.sparkSession
    df.select(col(idCol).as(idAlias), col(vecCol).as(vecAlias))
      .withColumn(nrmAlias,
        sqrt(graft.functions.VectorFunctions.dotNative(spark, col(vecAlias), col(vecAlias))))
  }

  /** Exact brute-force top-k neighbours for each query vector.
    *
    * The query side is expected to be small (a probe set) and is broadcast;
    * the corpus streams through one stage: |corpus| × |queries| dot products,
    * map-side only, then a per-query top-k window on the (tiny) scored set.
    * For corpus-×-corpus all-pairs at scale, use [[lshTopK]].
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(prepared(queries, idCol, vecCol, "query_id", "q_vec", "q_nrm"))
    val c = prepared(corpus, idCol, vecCol, "neighbor_id", "c_vec", "c_nrm")
      .repartition(col("neighbor_id")) // spread the stream side across cores
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        (graft.functions.VectorFunctions.dotNative(
          corpus.sparkSession, col("q_vec"), col("c_vec")) /
          (col("q_nrm") * col("c_nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Random-hyperplane LSH bucket key: the sign pattern of `numPlanes`
    * pseudo-random hyperplane projections. Hyperplane components are derived
    * deterministically from (plane, dim) stable hashes — no stored model,
    * reproducible across runs and engines.
    */
  def hyperplaneSignature(vec: Column, dim: Int, numPlanes: Int = 8): Column = {
    val signs = (0 until numPlanes).map { p =>
      // component h(p,d) in [-0.5, 0.5): cheap deterministic pseudo-randoms
      val proj = (0 until dim).map { d =>
        val w = (math.abs(scala.util.hashing.MurmurHash3.stringHash(s"$p#$d")) % 1000) / 1000.0 - 0.5
        element_at(vec, d + 1).cast("double") * w
      }.reduce(_ + _)
      when(proj >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    concat(signs: _*)
  }

  /** Approximate top-k: bucket by hyperplane signature, brute-force within
    * buckets only. Multi-probe via `numTables` independent sign families
    * raises recall; each table is a shuffle on its (short string) key.
    */
  def lshTopK(
      corpus: DataFrame,
      k: Int = 5,
      dim: Int = 64,
      numPlanes: Int = 8,
      numTables: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val tables = (0 until numTables).map { t =>
      val sig = hyperplaneSignatureSeeded(col(vecCol), dim, numPlanes, seed = t * 1000)
      corpus.select(
        lit(t).as("tbl"), sig.as("bucket"),
        col(idCol), col(vecCol))
    }
    val bucketed = tables.reduce(_ unionByName _)
    val a = bucketed.select(col("tbl"), col("bucket"), col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val b = bucketed.select(col("tbl"), col("bucket"), col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = a.join(b, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("c_vec")).as("cosine"))
      .groupBy("query_id", "neighbor_id").agg(max("cosine").as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def hyperplaneSignatureSeeded(
      vec: Column, dim: Int, numPlanes: Int, seed: Int): Column = {
    val signs = (0 until numPlanes).map { p =>
      val proj = (0 until dim).map { d =>
        val w =
          (math.abs(scala.util.hashing.MurmurHash3.stringHash(s"${seed + p}#$d")) % 1000) / 1000.0 - 0.5
        element_at(vec, d + 1).cast("double") * w
      }.reduce(_ + _)
      when(proj >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    concat(signs: _*)
  }

  /** All pairs above a cosine threshold (near-duplicate detection by
    * embedding). Exact over the full cross product — quadratic; suitable for
    * per-bucket use or bounded corpora. The scale path composes this with
    * LSH buckets.
    */
  def cosinePairsAbove(
      corpus: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val a = prepared(corpus, idCol, vecCol, "id_a", "v_a", "n_a")
      .repartition(col("id_a")) // spread the stream side of the BNLJ
    val b = prepared(corpus, idCol, vecCol, "id_b", "v_b", "n_b")
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"), col("id_b"),
        round(
          graft.functions.VectorFunctions.dotNative(
            corpus.sparkSession, col("v_a"), col("v_b")) /
            (col("n_a") * col("n_b")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
