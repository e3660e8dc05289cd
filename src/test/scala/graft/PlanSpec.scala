package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression tests: the scale properties SURVEY §4 calls out
  * (predicate pushdown, column pruning, broadcast dims, map-side partial
  * aggregation, semi-join shapes) must stay visible in explain output — a
  * plan that silently loses its pushdown still "passes correctness" while
  * being 100× slower at 100 TB, so the plan itself is under test.
  */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf0001).queryExecution.explainString(FormattedMode)

  test("q01: filter pushed to parquet, schema pruned, partial aggregation") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("partial_sum"), "map-side combine missing")
    assert(!p.contains("l_tax"), "reads more columns than the query needs")
  }

  test("q02: every predicate reaches the scan; only 6 of 11 columns read") {
    val p = plan("q02_filter_project")
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
      "GreaterThanOrEqual(l_discount", "LessThan(l_quantity")
      .foreach(f => assert(p.contains(f), s"predicate not pushed: $f"))
    assert(!p.contains("l_returnflag"))
  }

  test("q03: dimension joins broadcast; fact side never shuffles for the dims") {
    val p = plan("q03_join_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q04: EXISTS compiles to a broadcast left-semi join") {
    val p = plan("q04_semi_join_exists")
    assert(p.contains("LeftSemi"))
  }

  test("q22: similarity inner loop uses the native dot product, not zip_with") {
    val p = plan("q22_cosine_pairs")
    assert(p.contains("dotproduct") || p.contains("DotProduct") || p.contains("graft_dot"),
      s"native expression missing from plan")
    assert(!p.contains("zip_with"))
  }

  test("q15: detection joins stay broadcast at catalog scale") {
    val p = plan("q15_detect_relationships")
    assert(p.contains("BroadcastHashJoin"))
  }
}
