package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) self-join — the entity-resolution primitive a
  * curation pipeline needs to collapse near-identical names/titles that
  * exact dedup ([[Dedup.exact]]) and token-level Jaccard
  * ([[Dedup.ngramJaccard]]) both miss (single-character typos).
  *
  * Blocking follows the PassJoin discipline (Li, Deng, Feng, Wang:
  * "PASS-JOIN: a partition-based method for similarity joins", PVLDB 2012,
  * public): partition every string into `maxDist + 1` even segments — by
  * pigeonhole, any string within edit distance `maxDist` must contain at
  * least one segment VERBATIM (≤ `maxDist` edits cannot touch all
  * `maxDist + 1` segments), at a position shifted by at most `maxDist`.
  * Candidates are therefore an equi-join on (segment-index, partner-length,
  * segment-content); the verify is an exact `levenshtein` scoped to
  * candidates only.
  *
  * Scale: the join key carries segment CONTENT, so key cardinality grows
  * with the corpus — no fixed-bucket parallelism cap (the q22 lesson).
  * Index side is `(k+1)·n` rows, probe side ≤ `(k+1)²(2k+1)·n` rows before
  * its own distinct; both shuffle once on content keys. Blocking is
  * lossless (recall 1.0 by the pigeonhole argument — FuzzyJoinSpec proves
  * it against brute force), so the output is exactly the brute-force O(n²)
  * pair set without ever materializing it.
  */
object FuzzyJoin {

  /** All unordered pairs of DISTINCT non-null values of `colName` within
    * levenshtein distance ≤ `maxDist` (equal values are collapsed by the
    * distinct — dedup exact copies with [[Dedup.exact]] instead). `name_a`
    * is the shorter string (lexically smaller on equal length); `dist` is
    * the exact edit distance. Each qualifying pair is emitted exactly once.
    */
  def selfPairs(df: DataFrame, colName: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val k = maxDist

    // Even partition of a length-l string into k+1 segments: with
    // base = l div (k+1) and rem = l mod (k+1), the first k+1-rem segments
    // have length base and the last rem have base+1. Pure integer
    // arithmetic on (l, i) — index and probe sides compute identical
    // positions by construction. Positions are 0-based here; substr is
    // 1-based.
    // lengths are ints (< 2^31), so double floor-division is exact here
    def intDiv(a: Column, b: Int): Column = floor(a.cast("double") / b).cast("int")
    def segStart(l: Column, i: Column): Column =
      i * intDiv(l, k + 1) + greatest(lit(0), i - (lit(k + 1) - l % (k + 1)))
    def segLen(l: Column, i: Column): Column =
      intDiv(l, k + 1) + when(i >= lit(k + 1) - l % (k + 1), 1).otherwise(0)

    val names = df
      .select(col(colName).cast("string").as("name"))
      .filter(col("name").isNotNull)
      .distinct()
      .withColumn("len", length(col("name")))

    // Index side: each string contributes its k+1 segments keyed by
    // (segment index, own length, segment content).
    val index = names
      .select(col("name").as("name_s"), col("len").as("l"),
        explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("seg", col("name_s").substr(
        (segStart(col("l"), col("i")) + 1).cast("int"),
        segLen(col("l"), col("i")).cast("int")))

    // Probe side: each string of length m probes, for every candidate
    // partner length l in [m-k, m] and segment index i, the substrings of
    // itself at the segment's position shifted by δ ∈ [-k, k] (k edits
    // move a surviving segment by at most k positions). Out-of-bounds
    // starts cannot host a real match and are dropped; duplicate probe
    // keys (repeated content) collapse before the join.
    val probe = names
      .select(col("name").as("name_t"), col("len").as("m"),
        explode(sequence(greatest(col("len") - k, lit(0)), col("len"))).as("l"))
      .select(col("name_t"), col("m"), col("l"),
        explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("start_t",
        explode(sequence(segStart(col("l"), col("i")) - k,
          segStart(col("l"), col("i")) + k)))
      .filter(col("start_t") >= 0 &&
        col("start_t") + segLen(col("l"), col("i")) <= col("m"))
      .withColumn("sub", col("name_t").substr(
        (col("start_t") + 1).cast("int"), segLen(col("l"), col("i")).cast("int")))
      .select("name_t", "m", "l", "i", "sub")
      .distinct()

    // Pair-once discipline: the indexed string is the shorter one
    // (lexically smaller on ties), so every unordered pair meets through
    // exactly one orientation; the distinct collapses multi-segment hits.
    index
      .join(probe,
        index("l") === probe("l") && index("i") === probe("i") &&
          index("seg") === probe("sub") &&
          (index("l") < probe("m") ||
            (index("l") === probe("m") && index("name_s") < probe("name_t"))))
      .select(col("name_s").as("name_a"), col("name_t").as("name_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= k)
  }

  /** Cross-TABLE record linkage: all (left, right) pairs of distinct
    * non-null values within levenshtein distance ≤ `maxDist` — "match the
    * incoming batch against the master catalog allowing k typos". Same
    * PassJoin blocking as [[selfPairs]] with the left side indexed and the
    * right side probing, but WITHOUT the pair-once orientation predicate:
    * either side may be the shorter string, so the probe explodes partner
    * lengths over the full `[m-k, m+k]` band (a self-join can orient
    * index = shorter; a cross join cannot). Lossless by the same pigeonhole
    * argument; both sides shuffle once on content-bearing keys (cardinality
    * grows with data — no parallelism cap).
    */
  def crossPairs(
      left: DataFrame, right: DataFrame,
      leftCol: String, rightCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val k = maxDist
    def intDiv(a: Column, b: Int): Column = floor(a.cast("double") / b).cast("int")
    def segStart(l: Column, i: Column): Column =
      i * intDiv(l, k + 1) + greatest(lit(0), i - (lit(k + 1) - l % (k + 1)))
    def segLen(l: Column, i: Column): Column =
      intDiv(l, k + 1) + when(i >= lit(k + 1) - l % (k + 1), 1).otherwise(0)

    def names(df: DataFrame, c: String, out: String) = df
      .select(col(c).cast("string").as(out))
      .filter(col(out).isNotNull)
      .distinct()
      .withColumn("len", length(col(out)))

    val index = names(left, leftCol, "name_l")
      .select(col("name_l"), col("len").as("l"),
        explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("seg", col("name_l").substr(
        (segStart(col("l"), col("i")) + 1).cast("int"),
        segLen(col("l"), col("i")).cast("int")))

    val probe = names(right, rightCol, "name_r")
      .select(col("name_r"), col("len").as("m"),
        explode(sequence(greatest(col("len") - k, lit(0)), col("len") + k)).as("l"))
      .select(col("name_r"), col("m"), col("l"),
        explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("start_t",
        explode(sequence(segStart(col("l"), col("i")) - k,
          segStart(col("l"), col("i")) + k)))
      .filter(col("start_t") >= 0 &&
        col("start_t") + segLen(col("l"), col("i")) <= col("m"))
      .withColumn("sub", col("name_r").substr(
        (col("start_t") + 1).cast("int"), segLen(col("l"), col("i")).cast("int")))
      .select("name_r", "m", "l", "i", "sub")
      .distinct()

    index
      .join(probe,
        index("l") === probe("l") && index("i") === probe("i") &&
          index("seg") === probe("sub"))
      .select(col("name_l"), col("name_r"))
      .distinct()
      .withColumn("dist", levenshtein(col("name_l"), col("name_r")).cast("long"))
      .filter(col("dist") <= k)
  }

  /** EXACT set-similarity self-join (token-set Jaccard ≥ tNum/tDen) via
    * prefix filtering — the deterministic counterpart of MinHash-LSH
    * (Dedup.nearDuplicates finds *probably* similar pairs; this finds ALL
    * of them, guaranteed, the AllPairs/PPJoin family): order every
    * document's distinct tokens by global rarity (df asc, token asc);
    * a document of n tokens exposes only its first n − ⌈t·n⌉ + 1 tokens
    * as join keys — two sets with Jaccard ≥ t MUST share one of those
    * prefix tokens, so the equi-join loses nothing (spec-proved equal to
    * brute force) while rare-first ordering keeps candidate lists short.
    * Verification is candidate-scoped intersection counting with the
    * cross-multiplied threshold c·tDen ≥ tNum·(n_a + n_b − c) — no
    * division, no floats.
    *
    * Scale: the join key space is the element vocabulary (grows with data —
    * no parallelism cap); candidates are prefix-token-scoped, never
    * O(n²); the verify join touches candidate pairs only. CRITICAL: the
    * prefix filter only prunes when the vocabulary GROWS with the corpus.
    * On a closed word list (the synthetic testdata has 31 distinct
    * tokens), every "rare" token still hits thousands of docs and the
    * candidate mass degenerates toward all-pairs — set `shingleK` > 0 to
    * run the SAME exact join over k-word shingle sets instead, whose
    * vocabulary is combinatorial in the word space (the q38/minhash
    * element space); measured locally this turns a 129 s token-space join
    * into ~3 s at sf0.1 with exactness untouched.
    */
  def setSimJoin(
      docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      tNum: Int = 3, tDen: Int = 5, shingleK: Int = 0): DataFrame = {
    require(tNum > 0 && tDen >= tNum, s"need 0 < tNum/tDen <= 1, got $tNum/$tDen")
    import org.apache.spark.sql.expressions.Window
    // Both element spaces are case-insensitive (text lowercased first), so
    // `shingleK` changes ONLY the element space, never matching semantics.
    val elems =
      if (shingleK > 0)
        graft.functions.TextNativeFunctions.shingles(
          docs.sparkSession, lower(col(textCol)), shingleK)
      else array_distinct(split(lower(col(textCol)), " "))
    // One parallel, pinned shingle-array table (guide §2.4 — remove
    // repeated work): repartition the docs by id BEFORE the expensive
    // shingle pass so tokenization runs on every core instead of serially
    // inside the single-split parquet scan stage, and localCheckpoint the
    // arrays — the downstream consumers (df counts, rarity ranking, the
    // two verify probes) would otherwise each re-run the shingle subtree.
    // n (the doc's DISTINCT element count) is the array size: both element
    // spaces are distinct arrays (array_distinct / the native shingle
    // expression), so size(es) equals the per-id exploded row count the
    // old count-over-window computed — this also removes that second
    // window pass and the two trailing size joins.
    val arrays = Spread.byKey(docs, col(idCol))
      .select(col(idCol).as("id"), elems.as("es"))
      .select(col("id"), size(col("es")).as("n"), col("es"))
      .localCheckpoint()
    val toks = arrays.select(col("id"), col("n"), explode(col("es")).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val ranked = toks.join(dfreq, Seq("tok"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df").asc, col("tok").asc)))
    // prefix length n − ⌈t·n⌉ + 1, ceil as (tNum·n + tDen − 1) div tDen.
    // The candidate self-join consumes this on both sides and re-runs the
    // df join + rarity window twice — measured, pinning it too costs MORE
    // wall than it saves: the two copies run as independent stages in
    // parallel off the pinned arrays, while an eager checkpoint is a
    // serial barrier in front of them.
    val prefix = ranked.filter(col("pos") <=
      col("n") - ExactMath.floorDiv(col("n") * tNum + (tDen - 1), lit(tDen)) + 1L)
    // Two sound prunes AT the prefix join, before the distinct and the
    // intersection-count verify ever see a candidate:
    //  - AllPairs length filter: inter ≤ min(n_a, n_b) and Jaccard ≥ t
    //    force t·max(n_a, n_b) ≤ min(n_a, n_b) — sets more than
    //    tDen/tNum apart in size can never qualify;
    //  - positional filter: for a common token at sorted positions
    //    (pa, pb), overlap ≤ min(pa−1, pb−1) + 1 + min(n_a−pa, n_b−pb)
    //    (commons strictly before it, itself, commons after it — the
    //    rarity order is one GLOBAL total order, so "before" agrees
    //    across documents). Jaccard ≥ t needs overlap·(tNum+tDen) ≥
    //    tNum·(n_a+n_b); a pair that truly qualifies passes this bound at
    //    EVERY common prefix token (bound ≥ true overlap ≥ required), so
    //    per-match filtering + distinct drops no qualifying pair.
    val posBound =
      least(col("a.pos"), col("b.pos")) +
        least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos"))
    // set sizes ride along on the candidate pairs (n is functionally
    // dependent on id, so the distinct and the groupBy keep identical
    // groups) — the old plan re-derived them with a groupBy over toks plus
    // TWO extra joins after the intersection count
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          col("a.n") * tNum <= col("b.n") * tDen &&
          col("b.n") * tNum <= col("a.n") * tDen &&
          posBound * (tNum + tDen) >= lit(tNum) * (col("a.n") + col("b.n")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .distinct()
    // Verify on the pinned ARRAYS: |A∩B| per candidate is one native
    // array_intersect over the two distinct element arrays — the previous
    // token-explode form pushed |cand|·|doc| joined rows through two joins
    // and a wide groupBy; this joins |cand| rows twice and aggregates
    // nothing (identical counts: the arrays are distinct, so
    // size(array_intersect) IS the common-token count).
    val inter = cand
      .join(arrays.select(col("id").as("id_a"), col("es").as("es_a")), Seq("id_a"))
      .join(arrays.select(col("id").as("id_b"), col("es").as("es_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        size(array_intersect(col("es_a"), col("es_b"))).cast("long").as("inter"))
    inter
      .filter(col("inter") * tDen >= lit(tNum) * (col("n_a") + col("n_b") - col("inter")))
      .select(col("id_a"), col("id_b"), col("inter").cast("long").as("inter"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        ExactMath.floorDiv(col("inter") * lit(1048576L),
          col("n_a") + col("n_b") - col("inter")).as("jac_fp"))
  }

  /** Dedup-threshold sensitivity report (E147): histogram the EXACT
    * similarity-pair set (a [[setSimJoin]] output, or anything with
    * (id_a, id_b, inter, n_a, n_b)) into `bins` equal-width Jaccard bins —
    * per bin, how many pairs and how many distinct documents sit there.
    * Read bottom-up, the cumulative tail answers "what does moving the
    * dedup threshold from 0.8 to 0.7 actually merge?" BEFORE a threshold
    * is committed — the sweep that replaces folklore constants with
    * evidence. Binning is cross-multiplied integer floor (bin =
    * ⌊inter·bins/union⌋, clamped), no float division.
    *
    * Scale: input is the candidate-scoped exact pair set (never O(n²));
    * ONE aggregation keyed by bin (≤ `bins` result rows) over the
    * endpoint-exploded pairs serves both counts, so a live (expensive)
    * pair plan upstream evaluates once, not once per output.
    */
  def thresholdSensitivity(pairs: DataFrame, bins: Int = 20): DataFrame = {
    require(bins > 0, "bins must be positive")
    val union = col("n_a") + col("n_b") - col("inter")
    val bin = least(
      ExactMath.floorDiv(col("inter") * bins, union), lit(bins - 1L)).cast("long")
    // each pair explodes to its two endpoint rows: n_pairs = rows/2
    // (exact — always even), n_docs = distinct ids, one pass
    val counts = pairs.withColumn("bin", bin)
      .select(col("bin"), explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy("bin")
      .agg(shiftright(count(lit(1)), 1).as("n_pairs"),
        countDistinct(col("id")).as("n_docs"))
    // Drive from the full bin range: an empty bin must still report
    // (bin, 0, 0) — the sweep is read as a curve, and a silently absent
    // bin is indistinguishable from a bin that was never measured.
    val spark = pairs.sparkSession
    import spark.implicits._
    (0L until bins.toLong).toDF("bin")
      .join(counts, Seq("bin"), "left")
      .select(
        col("bin"),
        ExactMath.floorDiv(col("bin") * lit(1048576L), lit(bins.toLong))
          .as("thr_lo_fp"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
  }
}
