package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy auditing for datasets about people: k-anonymity over a set of
  * quasi-identifier columns. A released dataset is k-anonymous when every
  * quasi-identifier combination is shared by ≥ k rows; combinations below k
  * single out individuals and must be suppressed or generalized before
  * release.
  *
  * Scale: one hash aggregation keyed on the quasi-identifier tuple — the
  * shuffle carries (tuple, partial count), map-side combined, so cost is
  * O(distinct combinations), not O(rows). The suppression filter is then a
  * broadcast-or-shuffle semi-join of the data against the below-k tuples
  * (small by definition when the data is nearly anonymous).
  */
object Privacy {

  /** Per-combination audit: quasi-identifier values, group size, and
    * whether the group meets the k threshold.
    */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("anonymous", col("group_size") >= k)
  }

  /** Rows whose quasi-identifier combination fails k — the suppression set
    * (left-semi join against the failing tuples).
    */
  def suppressionSet(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    val failing = kAnonymityAudit(df, quasiIds, k)
      .filter(!col("anonymous")).select(quasiIds.map(col): _*)
    df.join(failing, quasiIds, "left_semi")
  }

  /** Deterministic pseudonymization: replace an identifier with the
    * `tokenLen`-hex-char prefix of a salted digest. The same id always maps
    * to the same token (joins across pseudonymized tables keep working) and
    * the mapping is never materialized — anyone holding the salt can
    * recompute it, nobody else can reverse it short of enumerating the id
    * space. Map-only: no shuffle, no lookup table to distribute.
    */
  def pseudonymize(
      df: DataFrame, idCol: String, salt: String,
      tokenCol: String = "token", tokenLen: Int = 16): DataFrame = {
    require(tokenLen >= 1 && tokenLen <= 32, "tokenLen must be in [1, 32]")
    df.withColumn(tokenCol,
      substring(
        md5(concat_ws("#", col(idCol).cast("string"), lit(salt))), 1, tokenLen))
  }

  /** Collision audit for [[pseudonymize]]: the distinct id→token mapping
    * with, per row, how many DISTINCT ids share that token. Any
    * `ids_on_token > 1` row is a collision — two people merged under one
    * pseudonym, which silently corrupts every downstream per-user
    * aggregate. At 16 hex chars (64 bits) collisions need ~2³² ids
    * (birthday bound); shorter tokens trade linkability for risk, and this
    * audit is the check that the trade held on the actual data.
    *
    * Scale: one distinct over (id, token) — map-side combined, shuffle
    * carries unique ids once — and one count window keyed by token.
    */
  def pseudonymAudit(
      df: DataFrame, idCol: String, salt: String, tokenLen: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    pseudonymize(df.select(col(idCol)).distinct(), idCol, salt, "token", tokenLen)
      .withColumn("ids_on_token",
        count(lit(1)).over(Window.partitionBy(col("token"))).cast("long"))
      .withColumn("collision", col("ids_on_token") > 1L)
  }
}
