package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is an operator from SURVEY §2 (or a north-star
  * extension); `oracleSql` carries the DuckDB-equivalent SQL the driver uses
  * as a correctness oracle at sf0.01.
  *
  * Numeric-parity convention: any aggregated DOUBLE flows through a
  * DECIMAL(18,4) cast before SUM so the aggregate is exact and
  * order-independent, then back to DOUBLE — Spark and DuckDB then agree
  * bit-for-bit, regardless of partitioning / summation order.
  */
object SparkEntry {

  /** Exact, order-independent sum of a double column, returned as double. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------------------
    // A1/A2/A4-family: hash aggregation with partial+final combine.
    // TPC-H Q1 shape: one full scan, group-by on two low-cardinality keys.
    // At 100 TB this is scan-bound; map-side partial aggregation reduces the
    // shuffle to #distinct-groups × #partitions rows.
    // ------------------------------------------------------------------
    "q01_pricing_summary" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          sum($"l_extendedprice".cast(DecimalType(18, 4)) *
            (lit(1).cast(DecimalType(18, 4)) - $"l_discount".cast(DecimalType(18, 4))))
            .cast("double").as("sum_disc_price"),
          (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
          (dsum($"l_extendedprice") / count(lit(1))).as("avg_price"),
          (dsum($"l_discount") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // ------------------------------------------------------------------
    // P-family: projection + predicate, both pushed into the parquet scan
    // (PushedFilters + ReadSchema show only 4 of 11 lineitem columns read).
    // ------------------------------------------------------------------
    "q02_filter_project" -> { (s, dir) =>
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter(
          $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
            $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
        .select(
          $"l_orderkey",
          $"l_linenumber",
          $"l_extendedprice",
          $"l_discount")
    },

    // ------------------------------------------------------------------
    // J-family: multi-way equi-join. nation/region are broadcast (tiny dims);
    // orders⋈lineitem is the only real shuffle. At scale, AQE keeps the big
    // join SMJ/shuffled-hash and the dims broadcast.
    // ------------------------------------------------------------------
    "q03_join_revenue_by_nation" -> { (s, dir) =>
      import s.implicits._
      val rev = $"l_extendedprice".cast(DecimalType(18, 4)) *
        (lit(1).cast(DecimalType(18, 4)) - $"l_discount".cast(DecimalType(18, 4)))
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
        .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
    },

    // ------------------------------------------------------------------
    // J8/U2-analog: left-semi join (EXISTS). Semi-join avoids materializing
    // the probe side — at 100 TB the lineitem side never leaves its stage.
    // ------------------------------------------------------------------
    "q04_semi_join_exists" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.lineitem(s, dir)
        .filter($"l_shipdate" >= lit("1995-06-01").cast("timestamp"))
        .select($"l_orderkey")
      Tables.orders(s, dir)
        .join(li, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },

    // ------------------------------------------------------------------
    // U3/J9-analog: left-anti join (NOT EXISTS) — the orphan detector from
    // the reference's referential-integrity test (data_relationship_tester
    // .py:91).
    // ------------------------------------------------------------------
    "q05_anti_join_orphans" -> { (s, dir) =>
      import s.implicits._
      val recent = Tables.orders(s, dir)
        .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
      Tables.customer(s, dir)
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
    },

    // ------------------------------------------------------------------
    // J9: referential-integrity overlap ratio (data_relationship_tester
    // .py:153-177) — |distinct(src) ∩ distinct(tgt)| / |distinct(src)|,
    // orphans = distinct src values with no match. Distinct-then-semi-join:
    // the distinct shrinks the shuffle to key cardinality before the join.
    // ------------------------------------------------------------------
    "q06_ri_overlap" -> { (s, dir) =>
      import s.implicits._
      val src = Tables.orders(s, dir).select($"o_custkey".as("v")).where($"v".isNotNull).distinct()
      val tgt = Tables.customer(s, dir).select($"c_custkey".as("v")).distinct()
      val matched = src.join(tgt, Seq("v"), "left_semi").agg(count(lit(1)).as("matched"))
      val total = src.agg(count(lit(1)).as("total_src"))
      matched.crossJoin(total).select(
        ($"matched".cast("double") / $"total_src").as("ri_ratio"),
        ($"total_src" - $"matched").as("orphan_values"),
        $"total_src")
    },

    // ------------------------------------------------------------------
    // A1: frequency distribution — value → count + share of total
    // (data_relationship_tester.py:286-298).
    // ------------------------------------------------------------------
    "q07_freq_distribution" -> { (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("share", $"cnt".cast("double") / sum($"cnt").over(Window.partitionBy()))
    },

    // ------------------------------------------------------------------
    // A2/A3: distinct-count + row-count cardinality probes
    // (data_relationship_tester.py:166-174, 341-348).
    // ------------------------------------------------------------------
    "q08_cardinality_probe" -> { (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir).agg(
        count(lit(1)).as("n_rows"),
        countDistinct($"o_custkey").as("n_custkeys"),
        countDistinct($"o_orderstatus").as("n_statuses"),
        countDistinct($"o_orderpriority").as("n_priorities"))
    },

    // ------------------------------------------------------------------
    // W1: top-k per group via ranking window — the reference's
    // max-3-relationships-per-table filter shape (relationship_detector
    // .py:763-830). Deterministic total order (SURVEY §7.4.2).
    // ------------------------------------------------------------------
    "q09_topk_per_group" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Tables.orders(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
    },

    // ------------------------------------------------------------------
    // U1/U4: distinct union across sources (restore_dataset.sh:117-130's
    // `sort -u` of discovered table names, over data columns here).
    // ------------------------------------------------------------------
    "q10_union_distinct" -> { (s, dir) =>
      import s.implicits._
      Tables.orders(s, dir).select($"o_custkey".as("k"))
        .union(Tables.customer(s, dir).select($"c_custkey".as("k")))
        .distinct()
    },

    // ------------------------------------------------------------------
    // J10: distribution-similarity — two frequency tables joined on value,
    // similarity = avg(1-|p_a−p_b|) over common values × coverage
    // (data_relationship_tester.py:243-284). Computed here between the
    // l_returnflag distributions of two shipdate eras.
    // ------------------------------------------------------------------
    "q11_distribution_similarity" -> { (s, dir) =>
      import s.implicits._
      val li = Tables.lineitem(s, dir)
      def freq(df: DataFrame): DataFrame =
        df.groupBy($"l_returnflag".as("v")).agg(count(lit(1)).as("c"))
          .withColumn("p", $"c".cast("double") / sum($"c").over(Window.partitionBy()))
      val a = freq(li.filter($"l_shipdate" < lit("1995-01-01").cast("timestamp")))
        .select($"v", $"p".as("p_a"))
      val b = freq(li.filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp")))
        .select($"v", $"p".as("p_b"))
      a.join(b, Seq("v"))
        .agg(
          avg(lit(1.0) - abs($"p_a" - $"p_b")).as("similarity"),
          count(lit(1)).as("common_values"))
    },

    // ------------------------------------------------------------------
    // EXT dedup: exact deduplication by content hash over documents — keep
    // lowest doc_id per distinct text (hash-groupBy; one shuffle on the
    // digest, not the full text, at scale: group on md5).
    // ------------------------------------------------------------------
    "q12_dedup_exact" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy(md5($"text").as("content_hash"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
    })

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q03_join_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q04_semi_join_exists" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate >= TIMESTAMP '1995-06-01')
        |GROUP BY o_orderpriority""".stripMargin,
    "q05_anti_join_orphans" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2001-01-01')""".stripMargin,
    "q06_ri_overlap" ->
      """WITH src AS (SELECT DISTINCT o_custkey AS v FROM orders WHERE o_custkey IS NOT NULL),
        |     tgt AS (SELECT DISTINCT c_custkey AS v FROM customer),
        |     m AS (SELECT COUNT(*) AS matched FROM src WHERE v IN (SELECT v FROM tgt)),
        |     t AS (SELECT COUNT(*) AS total_src FROM src)
        |SELECT CAST(matched AS DOUBLE) / total_src AS ri_ratio,
        |       total_src - matched AS orphan_values,
        |       total_src
        |FROM m, t""".stripMargin,
    "q07_freq_distribution" ->
      """SELECT o_orderstatus, COUNT(*) AS cnt,
        |       CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS share
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q08_cardinality_probe" ->
      """SELECT COUNT(*) AS n_rows,
        |       COUNT(DISTINCT o_custkey) AS n_custkeys,
        |       COUNT(DISTINCT o_orderstatus) AS n_statuses,
        |       COUNT(DISTINCT o_orderpriority) AS n_priorities
        |FROM orders""".stripMargin,
    "q09_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,
    "q10_union_distinct" ->
      """SELECT o_custkey AS k FROM orders
        |UNION
        |SELECT c_custkey AS k FROM customer""".stripMargin,
    "q11_distribution_similarity" ->
      """WITH a AS (SELECT l_returnflag AS v,
        |                  CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS p_a
        |           FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-01-01'
        |           GROUP BY l_returnflag),
        |     b AS (SELECT l_returnflag AS v,
        |                  CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS p_b
        |           FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |           GROUP BY l_returnflag)
        |SELECT AVG(1.0 - ABS(p_a - p_b)) AS similarity, COUNT(*) AS common_values
        |FROM a JOIN b USING (v)""".stripMargin,
    "q12_dedup_exact" ->
      """SELECT MD5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY MD5(text)""".stripMargin)
}
