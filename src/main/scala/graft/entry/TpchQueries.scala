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
private[graft] object TpchQueries {

  /** TPC-H completion: the 11 remaining query shapes (q2 q7 q8 q9 q11 q12
    * q15 q16 q17 q20 q21), adapted to the available star schema — there is
    * no partsupp table and no shipmode/receipt-date columns, so supply cost
    * becomes the observed min unit price, "available quantity" becomes the
    * per-supplier shipped share, and "late" is shipdate > orderdate + N days
    * (the same adaptation discipline tpch_q4 set). Plans are written for the
    * 100 TB shape: dimension filters sit below the fact joins, every small
    * side is broadcast, and min/max "join-back" shapes are windows or
    * broadcast scalar joins — never a fact-fact self-join.
    */
  def defs: Seq[(String, Q)] = {
    // non-aggregated exact disc-price term (decimal in, decimal out) and its
    // DuckDB twin — summed exactly on both sides, cast to double on the way out
    def vol: Column =
      col("l_extendedprice").cast("decimal(18,2)") *
        (lit(java.math.BigDecimal.ONE).cast("decimal(3,2)") -
          col("l_discount").cast("decimal(3,2)"))
    val volSql = "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
    val W = org.apache.spark.sql.expressions.Window

    Seq(
    // Q2-shape: cheapest supplier per qualifying part. The agg+join-back of
    // the spec's correlated MIN subquery is a window min over one shuffle.
    "tpch_q2_min_cost_supp" -> Q(
      (s, d) => {
        val cost = T(s, d, "lineitem")
          .join(broadcast(T(s, d, "part")
              .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
              .select(col("p_partkey"), col("p_name"))),
            col("l_partkey") === col("p_partkey"))
          // one shuffle for both the agg AND the window below: hash on the
          // window's partition key up front — partitioning on a prefix of
          // the group keys satisfies the agg's clustered distribution
          .repartition(col("p_partkey"))
          .groupBy(col("p_partkey"), col("p_name"), col("l_suppkey"))
          .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
        val sup = broadcast(T(s, d, "supplier")
          .join(T(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
          .join(T(s, d, "region").filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
        cost.withColumn("best", min(col("unit_cost")).over(W.partitionBy(col("p_partkey"))))
          .filter(col("unit_cost") === col("best"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"), col("n_name"), col("p_partkey"), col("p_name"),
            round(col("unit_cost"), 6).as("unit_cost"), col("s_acctbal"))
          .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"))
          .limit(100)
          .drop("s_acctbal")
      },
      Some("""WITH cost AS (
             |  SELECT p_partkey, p_name, l_suppkey,
             |         min(l_extendedprice / l_quantity) AS unit_cost
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE p_type = 'LARGE' AND p_size <= 10
             |  GROUP BY 1, 2, 3),
             |best AS (SELECT *, min(unit_cost) OVER (PARTITION BY p_partkey) AS best FROM cost)
             |SELECT s_name, n_name, p_partkey, p_name, unit_cost FROM (
             |  SELECT s_name, n_name, p_partkey, p_name,
             |         round(unit_cost, 6) AS unit_cost, s_acctbal
             |  FROM best
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
             |  WHERE unit_cost = best
             |  ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100)""".stripMargin)),

    // Q7-shape: shipping volume between two nations by direction and year.
    // The 2-nation filter is applied inside each dimension BEFORE the fact
    // joins (Catalyst won't derive per-side filters from the pair disjunction).
    "tpch_q7_volume_shipping" -> Q(
      (s, d) => {
        val two = Seq("NATION_1", "NATION_2")
        val sup = broadcast(T(s, d, "supplier")
          .join(T(s, d, "nation").filter(col("n_name").isin(two: _*)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation")))
        val cust = broadcast(T(s, d, "customer")
          .join(T(s, d, "nation").filter(col("n_name").isin(two: _*)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation")))
        T(s, d, "lineitem")
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(T(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(round(discPrice, 2).as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |  CAST(year(l_shipdate) AS INT) AS l_year,
              |  round(CAST(sum($volSql) AS DOUBLE), 2) AS revenue
              |FROM lineitem
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
              |  AND n2.n_name IN ('NATION_1', 'NATION_2')
              |  AND n1.n_name <> n2.n_name
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // Q8-shape: one nation's market share of PROMO-part volume sold to one
    // region's customers, by order year. Conditional decimal sum / total.
    "tpch_q8_market_share" -> Q(
      (s, d) => {
        val cust = broadcast(T(s, d, "customer")
          .join(T(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
          .join(T(s, d, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey")))
        val sup = broadcast(T(s, d, "supplier")
          .join(T(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation")))
        T(s, d, "lineitem")
          .join(broadcast(T(s, d, "part").filter(col("p_type") === "PROMO")
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
          .join(T(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            round(sum(when(col("supp_nation") === "NATION_3", vol)
                .otherwise(lit(java.math.BigDecimal.ZERO).cast("decimal(18,2)"))).cast("double") /
              sum(vol).cast("double"), 6).as("mkt_share"),
            round(sum(vol).cast("double"), 2).as("total_volume"))
          .orderBy(col("o_year"))
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
              |  round(CAST(sum(CASE WHEN n1.n_name = 'NATION_3' THEN $volSql
              |                      ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
              |        / CAST(sum($volSql) AS DOUBLE), 6) AS mkt_share,
              |  round(CAST(sum($volSql) AS DOUBLE), 2) AS total_volume
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |WHERE o_custkey IN (
              |  SELECT c_custkey FROM customer
              |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |  JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'ASIA')
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Q9-shape: profit by supplier nation and year. Supply cost is proxied
    // as half the part's retail price per unit (no partsupp table); every
    // term stays decimal-exact until the final cast.
    "tpch_q9_profit" -> Q(
      (s, d) => {
        val profit = vol -
          (col("p_retailprice").cast("decimal(12,2)") *
            col("l_quantity").cast("decimal(12,2)") *
            lit(new java.math.BigDecimal("0.5")).cast("decimal(2,1)"))
        T(s, d, "lineitem")
          .join(broadcast(T(s, d, "part").filter(col("p_name").contains("red"))
            .select(col("p_partkey"), col("p_retailprice"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(T(s, d, "supplier")
            .join(T(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey"), col("n_name").as("nation"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(T(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(round(sum(profit).cast("double"), 2).as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
              |  round(CAST(sum($volSql -
              |    CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) *
              |    CAST(0.5 AS DECIMAL(2,1))) AS DOUBLE), 2) AS sum_profit
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)),

    // Q11-shape: parts whose shipped value through one nation's suppliers
    // exceeds a fraction of that whole value — scalar threshold kept exact
    // (decimal partial sums re-summed, never a double re-aggregation) and
    // broadcast against the per-part aggregate.
    "tpch_q11_important_value" -> Q(
      (s, d) => {
        val sup9 = broadcast(T(s, d, "supplier")
          .join(T(s, d, "nation").filter(col("n_name") === "NATION_9"),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey")))
        val byPart = T(s, d, "lineitem")
          .join(sup9, col("l_suppkey") === col("s_suppkey"), "left_semi")
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("pv"))
        val thresh = byPart
          .agg((sum(col("pv")).cast("double") * lit(0.001)).as("thr"))
        byPart.crossJoin(broadcast(thresh))
          .filter(col("pv").cast("double") > col("thr"))
          .select(col("l_partkey"), round(col("pv").cast("double"), 2).as("part_value"))
          .orderBy(col("part_value").desc, col("l_partkey"))
      },
      Some("""WITH byPart AS (
             |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS pv
             |  FROM lineitem
             |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
             |    JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_9')
             |  GROUP BY 1),
             |t AS (SELECT CAST(sum(pv) AS DOUBLE) * 0.001 AS thr FROM byPart)
             |SELECT l_partkey, round(CAST(pv AS DOUBLE), 2) AS part_value
             |FROM byPart, t WHERE CAST(pv AS DOUBLE) > thr
             |ORDER BY part_value DESC, l_partkey""".stripMargin)),

    // Q12-shape: late lines (shipped >60d after order) split into high/low
    // priority counts per return flag — shipmode replaced by o_orderpriority.
    "tpch_q12_late_lines" -> Q(
      (s, d) => T(s, d, "lineitem")
        .join(T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS") &&
          col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
            .as("low_line_count"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
             |  AND l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Q15-shape: supplier(s) with the max quarterly revenue — the view+max
    // correlate is an agg + broadcast scalar max join (ties all kept).
    "tpch_q15_top_supplier" -> Q(
      (s, d) => {
        val rev = T(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1997-04-01"))
          .groupBy(col("l_suppkey"))
          .agg(discPrice.as("total_rev"))
        val mx = rev.agg(max(col("total_rev")).as("mx"))
        rev.crossJoin(broadcast(mx))
          .filter(col("total_rev") === col("mx"))
          .join(broadcast(T(s, d, "supplier").select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("total_rev"), 2).as("total_rev"))
          .orderBy(col("s_suppkey"))
      },
      Some(s"""WITH rev AS (
              |  SELECT l_suppkey, CAST(sum($volSql) AS DOUBLE) AS total_rev
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              |    AND l_shipdate < TIMESTAMP '1997-04-01'
              |  GROUP BY 1),
              |mx AS (SELECT max(total_rev) AS mx FROM rev)
              |SELECT s_suppkey, s_name, round(total_rev, 2) AS total_rev
              |FROM rev CROSS JOIN mx
              |JOIN supplier ON l_suppkey = s_suppkey
              |WHERE total_rev = mx ORDER BY s_suppkey""".stripMargin)),

    // Q16-shape: distinct-supplier diversity per part attribute, excluding
    // negative-balance suppliers (the spec's complaint filter) by anti-join.
    "tpch_q16_supplier_diversity" -> Q(
      (s, d) => T(s, d, "lineitem")
        .join(broadcast(T(s, d, "part")
          .filter(col("p_brand") =!= "Brand#1" && !col("p_type").startsWith("PROMO") &&
            col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(T(s, d, "supplier").filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size")),
      Some("""SELECT p_brand, p_type, p_size,
             |  count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
             |  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // Q17-shape: revenue lost to sub-threshold small orders. The correlated
    // per-part AVG is a window (decimal sum / count — double AVG would be
    // partition-order dependent and could never hash-match).
    "tpch_q17_small_qty_rev" -> Q(
      (s, d) => {
        val li = T(s, d, "lineitem")
          .join(broadcast(T(s, d, "part").filter(col("p_brand") === "Brand#3")
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
        val w = W.partitionBy(col("l_partkey"))
        li.withColumn("avg_qty",
            sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double") /
              count(lit(1)).over(w))
          .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
          .agg(round(dsum(col("l_extendedprice")) / lit(7.0), 2).as("avg_yearly"),
            count(lit(1)).as("n_lines"))
      },
      Some("""WITH li AS (
             |  SELECT l_partkey, l_quantity, l_extendedprice
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE p_brand = 'Brand#3'),
             |av AS (SELECT *,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_partkey) AS DOUBLE)
             |    / count(*) OVER (PARTITION BY l_partkey) AS avg_qty
             |  FROM li)
             |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
             |    AS avg_yearly,
             |  count(*) AS n_lines
             |FROM av WHERE l_quantity < 0.2 * avg_qty""".stripMargin)),

    // Q20-shape: suppliers who shipped more than half of a part's 1997
    // volume ("excess supply" proxy), restricted to one nation — agg →
    // window share → semi-join, no correlated subqueries anywhere.
    "tpch_q20_dominant_supp" -> Q(
      (s, d) => {
        val shipped = T(s, d, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1998-01-01"))
          .join(broadcast(T(s, d, "part").filter(col("p_name").startsWith("small"))
            .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
          // shared shuffle: agg on (part, supp) and window on part reuse it
          .repartition(col("l_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("supp_qty"))
        val dominant = shipped
          .withColumn("part_qty",
            sum(col("supp_qty")).over(W.partitionBy(col("l_partkey"))))
          .filter(col("supp_qty").cast("double") > lit(0.5) * col("part_qty").cast("double"))
          .select(col("l_suppkey")).distinct()
        T(s, d, "supplier")
          .join(broadcast(T(s, d, "nation").filter(col("n_name") === "NATION_9")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH shipped AS (
             |  SELECT l_partkey, l_suppkey,
             |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |    AND l_shipdate < TIMESTAMP '1998-01-01'
             |    AND p_name LIKE 'small%'
             |  GROUP BY 1, 2),
             |dom AS (SELECT DISTINCT l_suppkey FROM (
             |  SELECT l_suppkey, CAST(supp_qty AS DOUBLE) AS sq,
             |         CAST(sum(supp_qty) OVER (PARTITION BY l_partkey) AS DOUBLE) AS pq
             |  FROM shipped) WHERE sq > 0.5 * pq)
             |SELECT s_suppkey, s_name FROM supplier
             |JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_9'
             |WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
             |ORDER BY s_suppkey""".stripMargin)),

    // Q21-shape: suppliers who were the SOLE late shipper in multi-supplier
    // finished orders. The spec's exists/not-exists self-join pair collapses
    // into one per-(order, supplier) aggregate plus per-order window counts.
    "tpch_q21_sole_late_supp" -> Q(
      (s, d) => {
        val lo = T(s, d, "lineitem")
          .join(T(s, d, "orders").filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .withColumn("late",
            when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1L)
              .otherwise(0L))
        // shared shuffle: the (order, supplier) agg and the per-order window
        // both run off one hash partitioning on o_orderkey
        val perSupp = lo.repartition(col("o_orderkey"))
          .groupBy(col("o_orderkey"), col("l_suppkey"))
          .agg(max(col("late")).as("supp_late"))
        val w = W.partitionBy(col("o_orderkey"))
        perSupp
          .withColumn("n_supp", count(lit(1)).over(w))
          .withColumn("n_late", sum(col("supp_late")).over(w))
          .filter(col("supp_late") === 1 && col("n_supp") > 1 && col("n_late") === 1)
          .groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
          .join(broadcast(T(s, d, "supplier").select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"), col("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""WITH lo AS (
             |  SELECT o_orderkey, l_suppkey,
             |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
             |         THEN 1 ELSE 0 END AS late
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_orderstatus = 'F'),
             |ps AS (SELECT o_orderkey, l_suppkey, max(late) AS supp_late
             |       FROM lo GROUP BY 1, 2),
             |fl AS (SELECT l_suppkey FROM (
             |  SELECT l_suppkey, supp_late,
             |    count(*) OVER (PARTITION BY o_orderkey) AS n_supp,
             |    sum(supp_late) OVER (PARTITION BY o_orderkey) AS n_late
             |  FROM ps) WHERE supp_late = 1 AND n_supp > 1 AND n_late = 1)
             |SELECT s_name, numwait FROM (
             |  SELECT l_suppkey, count(*) AS numwait FROM fl GROUP BY 1) c
             |JOIN supplier ON l_suppkey = s_suppkey
             |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin))
  )}
}
