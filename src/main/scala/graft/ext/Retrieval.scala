package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus retrieval: inverted-index postings and integer tf-idf search —
  * the "find the documents about X" primitive a curation pipeline needs for
  * decontamination audits, subject ablations, and eyeballing what a filter
  * actually removed.
  *
  * Scoring is tf·idf with idf_milli = ⌊10⁶·N/df⌋ — an integer rank-preserving
  * stand-in for the usual log(N/df): no transcendental functions, so scores
  * are exact BIGINTs and portable bit-for-bit across engines (the same
  * discipline as [[TextAnalysis.ngramNovelty]]'s milli-frequencies).
  */
object Retrieval {

  /** The inverted index as data: one (doc_id, term, tf) posting per distinct
    * term per document. One explode + one map-side-combined aggregation;
    * materialize it (partitioned/bucketed by term) when the corpus is
    * searched repeatedly.
    */
  def postings(
      docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Top-k documents for a bag of query terms, scored by Σ tf·idf_milli.
    *
    * Scale shape: the term filter lands BEFORE the tf aggregation, so only
    * tokens matching the (tiny, literal) query set ever shuffle; the
    * |terms|-row idf table broadcasts back; and the final top-k is a global
    * orderBy+limit — Spark plans it as TakeOrderedAndProject (per-partition
    * heaps, k rows to the driver), never a full sort.
    */
  def searchTopK(
      docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "searchTopK needs at least one query term")
    // N enters the plan as a 1-row broadcast aggregate (not an eager
    // docs.count() — that would run an extra job per composition and break
    // lazy composition); on an empty corpus no tf row exists, so the idf
    // expression never evaluates against n_docs = 0.
    val nRow = docs.agg(count(lit(1)).cast("long").as("n_docs"))
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .where(col("term").isin(queryTerms.map(_.toLowerCase): _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nRow))
      .withColumn("idf_milli",
        expr("(CAST(1000000 AS BIGINT) * n_docs) div df"))
    tf.join(broadcast(idf.select("term", "idf_milli")), Seq("term"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_terms"),
        sum(col("tf") * col("idf_milli")).as("score_num"))
      .orderBy(col("score_num").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Saturated BM25-style retrieval (E177): tf-idf with BM25's two fixes —
    * term-frequency SATURATION (tf·(k1+1)/(tf+K): the 50th occurrence of a
    * term is worth almost nothing, where raw tf-idf keeps paying linearly)
    * and LENGTH normalization (K = k1·(1−b+b·dl/avgdl): long documents
    * stop winning by volume). The idf factor is the same log-free rational
    * proxy the exact tf-idf search uses (N/df — logs are libm-dependent
    * and break cross-engine exactness; saturation, not log-idf, is BM25's
    * retrieval-quality lever). The per-doc score finishes in doubles with
    * one fixed expression tree, floored into 2²⁰ fixed point.
    *
    * Scale: identical shape to [[searchTopK]] — query-term postings only,
    * broadcast idf, TakeOrderedAndProject top-k; avgdl is one 1-row
    * aggregate broadcast into the scoring expression.
    */
  def bm25TopK(
      docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      k1Milli: Int = 1200, bMilli: Int = 750,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val lens = docs.select(col(idCol).as("doc_id"),
      size(split(lower(col(textCol)), " ")).cast("long").as("dl"))
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .where(col("term").isin(queryTerms.map(_.toLowerCase): _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N and Σdl enter the plan together as ONE 1-row broadcast aggregate —
    // no eager docs.count() job, and on an empty corpus no scoring row
    // exists so n_docs = 0 never reaches the divisions.
    val totals = lens.agg(sum(col("dl")).cast("long").as("sum_dl"),
      count(lit(1)).cast("long").as("n_docs"))
    val k1 = k1Milli / 1000.0
    val b = bMilli / 1000.0
    tf.join(broadcast(idf), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      // avgdl enters as the exact rational sum_dl/n inside one double tree
      .withColumn("contrib",
        (col("n_docs").cast("double") / col("df").cast("double")) *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") /
              (col("sum_dl").cast("double") / col("n_docs").cast("double")))))
      // floor each TERM contribution before summing: integer sums are
      // order-independent where a double fold across partitions is not
      .withColumn("contrib_fp", floor(col("contrib") * lit(1048576.0)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("contrib_fp")).cast("long").as("score_fp"))
      .orderBy(col("score_fp").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Reciprocal-rank fusion of the lexical tf-idf ranking with a quality
    * ranking, over the query's candidate set: each candidate document gets
    * rrf = ⌊2²⁰/(60 + r_lex)⌋ + ⌊2²⁰/(60 + r_qual)⌋ and the top-k by
    * fused score wins. RRF is the standard way to combine rankings on
    * incomparable scales (tf-idf sums vs quality fractions) — no score
    * normalization, exact integers, and the 60-offset keeps any single
    * ranking from dominating. The same fusion drops in unchanged for a
    * lexical+vector hybrid: rank ANY second signal and add its term.
    *
    * Scale: ranks are windows over the CANDIDATE set (documents matching
    * at least one query term), not the corpus — the term filter bounds
    * the window input first. Final top-k is TakeOrderedAndProject.
    */
  def hybridTopK(
      docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = searchTopK(docs, queryTerms, Int.MaxValue, textCol, idCol)
      .select(col("doc_id"), col("score_num"))
    val qual = TextAnalysis.withQualityMetrics(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        floor(col("quality_score") * 1048576.0).cast("long").as("q_fp"))
    val fused = lex.join(qual, Seq("doc_id"))
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("score_num").desc, col("doc_id").asc)))
      .withColumn("r_qual", row_number().over(
        Window.orderBy(col("q_fp").desc, col("doc_id").asc)))
      .withColumn("rrf_fp",
        ExactMath.floorDiv(lit(1048576L), col("r_lex") + 60L) +
          ExactMath.floorDiv(lit(1048576L), col("r_qual") + 60L))
    fused
      .select(col("doc_id"), col("score_num"), col("q_fp"),
        col("r_lex").cast("long").as("r_lex"),
        col("r_qual").cast("long").as("r_qual"), col("rrf_fp"))
      .orderBy(col("rrf_fp").desc, col("doc_id").asc)
      .limit(k)
  }
}
