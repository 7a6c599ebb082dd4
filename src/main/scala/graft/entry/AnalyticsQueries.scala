package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.GraftFunctions
import graft.model.Schemas
import graft.ops.Relational
import graft.rag.Rag
import graft.sources.TestData
import graft.streaming.Events
import graft.text.TextAnalysis

import graft.entry.Shared._

/** Query family split out of SparkEntry (round-12); see Shared. */
private[graft] object AnalyticsQueries {

  def defs: Seq[(String, Q)] = Seq(

    // TPC-H Q1-shape pricing summary (SURVEY §7.2.6 star-schema battery)
    "tpch_q1_pricing" -> Q(
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          round(discPrice, 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |        (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS sum_disc_price,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // TPC-H Q3-shape: top-10 revenue among qualifying orders (join + topk)
    "tpch_q3_priority" -> Q(
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01"))
        .join(T(s, d, "orders").filter(col("o_orderdate") < lit("1998-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderpriority"))
        .agg(round(discPrice, 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some("""SELECT l_orderkey, o_orderpriority,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |        (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey AND o_orderdate < TIMESTAMP '1998-01-01'
             |JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
             |WHERE l_shipdate > TIMESTAMP '1998-01-01'
             |GROUP BY l_orderkey, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // TPC-H Q5-shape: revenue by region through the full dimension chain
    "tpch_q5_region_revenue" -> Q(
      (s, d) => T(s, d, "lineitem")
        .join(T(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(T(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(discPrice, 2).as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy(col("r_name")),
      Some("""SELECT r_name,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |        (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS revenue,
             |  count(*) AS n_lines
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // TPC-H Q6-shape: pure filter+agg — the pushdown showcase (every
    // predicate reaches the parquet scan, no shuffle at all pre-agg)
    "tpch_q6_forecast" -> Q(
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01") &&
          col("l_shipdate") < lit("1998-01-01") &&
          col("l_discount").between(0.02, 0.04) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(3,2)")).cast("double"), 2).as("revenue"),
          count(lit(1)).as("n_lines")),
      Some("""SELECT
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |        CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE), 2) AS revenue,
             |  count(*) AS n_lines
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin)),

    // TPC-H Q18-shape: HAVING on a big agg, then join back to orders —
    // exercises agg-filter + the join-back pattern (semi-join reduction)
    "tpch_q18_large_orders" -> Q(
      (s, d) => {
        val big = T(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(dsum(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 250)
        // the HAVING-filtered agg is tiny at any scale — broadcast IT, so the
        // orders scan never shuffles and never gets broadcast itself
        T(s, d, "orders").join(broadcast(big), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, total_qty
             |FROM (SELECT l_orderkey,
             |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250) big
             |JOIN orders ON l_orderkey = o_orderkey
             |ORDER BY o_orderkey""".stripMargin)),

    // TPC-H Q4-shape (adapted to available columns): orders with a lineitem
    // shipped >90 days after order date — correlated EXISTS planned as a
    // semi join with a non-equi conjunct; no per-row subquery at any scale
    "tpch_q4_priority_check" -> Q(
      (s, d) => {
        val o = T(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1998-01-01"))
        val li = T(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
        o.join(li,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders o
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey
             |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // TPC-H Q10-shape: revenue lost to returned items per customer — the
    // 4-way star join + top-k; dims broadcast, fact shuffles once on the agg
    "tpch_q10_returned" -> Q(
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(T(s, d, "orders")
            .filter(col("o_orderdate") >= lit("1997-01-01") && col("o_orderdate") < lit("1997-07-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(discPrice, 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20),
      Some("""SELECT c_custkey, c_name, n_name,
             |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |        (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
             |GROUP BY c_custkey, c_name, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q13-shape: customer order-count distribution — LEFT OUTER join
    // (zero-order customers must appear) then a histogram of group sizes
    "tpch_q13_custdist" -> Q(
      (s, d) => T(s, d, "customer")
        .join(T(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |      GROUP BY c_custkey) cc
             |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q14-shape: promo revenue share — conditional decimal aggregate
    // ratio in one pass over the month's lineitems (part dim broadcasts)
    "tpch_q14_promo" -> Q(
      (s, d) => {
        val disc = col("l_extendedprice").cast("decimal(18,2)") *
          (lit(java.math.BigDecimal.ONE).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))
        // conditional sum WITHOUT otherwise: nulls are skipped by sum, so the
        // decimal product type stays exact end-to-end (no mid-cast rounding)
        T(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-09-01") && col("l_shipdate") < lit("1997-10-01"))
          .join(T(s, d, "part"), col("l_partkey") === col("p_partkey"))
          .agg(round(
            lit(100.0) * sum(when(col("p_type") === "PROMO", disc)).cast("double")
              / sum(disc).cast("double"), 4).as("promo_share"))
      },
      Some("""SELECT round(100.0 *
             |  CAST(sum(CASE WHEN p_type = 'PROMO'
             |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
             |             (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) END) AS DOUBLE) /
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |       (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE),
             |  4) AS promo_share
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin)),

    // TPC-H Q19-shape: disjunctive brand/size/quantity predicates — the OR
    // of conjuncts must still prune (join stays equi on partkey, residual
    // disjunction evaluated post-join; partial pushdown per branch)
    "tpch_q19_disjunctive" -> Q(
      (s, d) => T(s, d, "lineitem")
        .join(T(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) && col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) && col("l_quantity").between(10, 30)))
        .agg(round(discPrice, 2).as("revenue"), count(lit(1)).as("n_items")),
      Some("""SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |        (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE), 2) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
             |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)""".stripMargin)),

    // TPC-H Q22-shape (adapted): above-average-balance customers with no
    // RECENT orders — scalar aggregate subquery (exact decimal avg, so both
    // engines compute the identical threshold) + anti join, per-segment
    // rollup (117 qualifying rows at sf0.01 — non-vacuous)
    "tpch_q22_idle_rich" -> Q(
      (s, d) => {
        val cust = T(s, d, "customer")
        val thresh = cust.filter(col("c_acctbal") > 0)
          .agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
        cust.crossJoin(broadcast(thresh))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(T(s, d, "orders")
              .filter(col("o_orderdate") >= lit("2000-06-01"))
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_cust"), round(dsum(col("c_acctbal")), 2).as("total_bal"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""WITH t AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
             |           FROM customer WHERE c_acctbal > 0)
             |SELECT c_mktsegment, count(*) AS n_cust,
             |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_bal
             |FROM customer, t
             |WHERE c_acctbal > t.avg_bal
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-06-01')
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // PIVOT (round-13): status columns from a fixed value list (the
    // schema must not depend on the data) — Spark's pivot + count yields
    // NULL for absent combinations where a FILTER aggregate yields 0, so
    // both sides coalesce explicitly.
    "x21_pivot" -> Q(
      (s, d) => T(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
             |  count(*) FILTER (o_orderstatus = 'F') AS n_f,
             |  count(*) FILTER (o_orderstatus = 'O') AS n_o,
             |  count(*) FILTER (o_orderstatus = 'P') AS n_p
             |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),

    // ROLLUP with grouping flags (round-13): subtotal + grand-total rows
    // in one pass (partial-aggregate expansion, not a union of scans);
    // grouping() flags disambiguate a NULL group from a rollup row on
    // both engines, and double as the deterministic sort key.
    "a21_rollup" -> Q(
      (s, d) => T(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        // grouping() is only legal inside the rollup's own agg
        .agg(grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio"),
          count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(col("g_status"), col("g_prio"),
          coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("g_status"), col("g_prio"), col("status"),
          col("priority")),
      Some("""SELECT CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
             |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
             |  coalesce(o_orderstatus, '<all>') AS status,
             |  coalesce(o_orderpriority, '<all>') AS priority,
             |  count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY g_status, g_prio, status, priority""".stripMargin))
  )
}
