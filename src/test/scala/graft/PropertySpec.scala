package graft

import graft.core.{ColumnMeta, TableMeta}
import graft.detect.RelationshipDetector
import graft.state.IncrementalState
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5): order-independence of conflict resolution,
  * checksum stability/sensitivity, Cochran bounds. Uses ScalaCheck Gen
  * directly (deterministic seeds) — scalatestplus is not in the offline
  * cache.
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val relGen = for {
    src <- Gen.oneOf("a", "b", "c")
    col <- Gen.oneOf("x", "y")
    tgt <- Gen.oneOf("t1", "t2")
    conf <- Gen.choose(0.1, 1.0)
    method <- Gen.oneOf("exact_match", "foreign_key", "custom_rule")
  } yield (src, col, tgt, "id", "many_to_one", conf, method, method == "custom_rule")

  test("conflict resolution is order-independent (argmax, not first-wins)") {
    import spark.implicits._
    def resolve(rs: Seq[(String, String, String, String, String, Double, String, Boolean)]) =
      RelationshipDetector.resolveConflicts(
        rs.toDF("source_table", "source_column", "target_table", "target_column",
          "relationship_type", "confidence", "detection_method", "is_custom"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
          r.getDouble(5), r.getString(6))).toSet
    samples(Gen.listOfN(12, relGen), 10).foreach { rels =>
      val rng = new scala.util.Random(42)
      assert(resolve(rels) === resolve(rng.shuffle(rels)))
    }
  }

  test("schema checksum: stable under recomputation, sensitive to every field") {
    val base = TableMeta("t", "p", "TABLE", Seq(
      ColumnMeta("a", "bigint", nullable = true, isArray = false, 0),
      ColumnMeta("b", "string", nullable = false, isArray = false, 1)), 0, 0)
    val c0 = IncrementalState.canonicalSchema(base)
    assert(c0 === IncrementalState.canonicalSchema(base))
    val variants = Seq(
      base.copy(tableName = "t2"),
      base.copy(columns = base.columns.map(c =>
        if (c.name == "a") c.copy(dataType = "string") else c)),
      base.copy(columns = base.columns.map(c =>
        if (c.name == "b") c.copy(nullable = true) else c)),
      base.copy(columns = base.columns.map(c =>
        if (c.name == "a") c.copy(isArray = true) else c)),
      base.copy(columns = base.columns.reverse.zipWithIndex.map { case (c, i) =>
        c.copy(ordinal = i)
      }))
    variants.foreach(v => assert(IncrementalState.canonicalSchema(v) !== c0))
  }

  test("Cochran sample size never exceeds the population and shrinks with MoE") {
    samples(Gen.choose(1L, 10000000L), 50).foreach { pop =>
      val n = graft.datatest.DataTester.cochranSampleSize(pop)
      assert(n >= 1L && n <= math.max(pop, 385L))
    }
    assert(graft.datatest.DataTester.cochranSampleSize(1000000, marginOfError = 0.01) >
      graft.datatest.DataTester.cochranSampleSize(1000000, marginOfError = 0.05))
  }

  test("ExactMath.floorDiv equals BigInt floor division across magnitudes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // cover the regime where naive decimal divide mis-floors: denominators
    // past 2e6 with numerators within 1 of an exact multiple
    val edge = for {
      b <- Gen.choose(2000000L, 4000000000L)
      q <- Gen.choose(0L, 1000000L)
      off <- Gen.oneOf(-1L, 0L, 1L)
    } yield (math.max(0L, b * q + off), b)
    val rand = for {
      a <- Gen.choose(0L, Long.MaxValue / 2)
      b <- Gen.choose(1L, Long.MaxValue / 2)
    } yield (a, b)
    val cases = (samples(edge, 60) ++ samples(rand, 60)).distinct
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.ext.ExactMath.floorDiv(col("a"), col("b")).as("q"))
      .collect()
    got.foreach { r =>
      val (a, b, q) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(q === (BigInt(a) / BigInt(b)).toLong, s"floorDiv($a, $b)")
    }
  }
}
