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
private[graft] object CoreQueries {

  def defs: Seq[(String, Q)] = Seq(

    // ── P: projections / filters ─────────────────────────────────────────
    "p1_key_filter" -> Q(
      (s, d) => T(s, d, "lineitem")
        .filter(col("l_orderkey") <= 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
             |FROM lineitem WHERE l_orderkey <= 10
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    "p2_notnull_count" -> Q(
      (s, d) => T(s, d, "embeddings")
        .filter(col("embedding").isNotNull)
        .agg(count(lit(1)).as("n_indexed")),
      Some("SELECT count(*) AS n_indexed FROM embeddings WHERE embedding IS NOT NULL")),

    "p3_score_threshold" -> Q(
      (s, d) => TestData.events(s, d)
        .filter(col("value") >= 100.0)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id, event_type, value
             |FROM events WHERE value >= 100.0 ORDER BY event_id""".stripMargin)),

    "p4_label_dispatch" -> Q(
      (s, d) => TestData.events(s, d)
        .select(col("event_id"),
          when(col("event_type").isin("purchase", "signup"), lit("conversion"))
            .otherwise(lit("engagement")).as("label"),
          when(col("event_type").isin("purchase", "signup"),
            concat(lit("e-"), col("event_id").cast("string")))
            .otherwise(concat(lit("u-"), col("user_id").cast("string"))).as("dispatch_id"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  CASE WHEN event_type IN ('purchase','signup') THEN 'conversion' ELSE 'engagement' END AS label,
             |  CASE WHEN event_type IN ('purchase','signup') THEN 'e-' || event_id ELSE 'u-' || user_id END AS dispatch_id
             |FROM events ORDER BY event_id""".stripMargin)),

    "p5_topic_routing" -> Q(
      (s, d) => {
        import s.implicits._
        (Schemas.eventTypes :+ "unknown_event").toDF("event_type")
          .select(col("event_type"), Events.topicFor(col("event_type"), routingTopics).as("topic"))
          .orderBy(col("event_type"))
      },
      Some(s"""SELECT event_type,
             |  CASE
             |    WHEN event_type IN ('query_received','research_complete','research_started') THEN 'wf-lifecycle'
             |    WHEN strpos(event_type, 'clarification') > 0 THEN 'wf-clarifications'
             |    WHEN strpos(event_type, 'image_') > 0 OR strpos(event_type, 'pdf_') > 0 OR strpos(event_type, '_generated') > 0 THEN 'wf-artifacts'
             |    WHEN strpos(event_type, 'search_') > 0 OR strpos(event_type, 'report_') > 0 OR strpos(event_type, 'knowledge_graph') > 0 THEN 'wf-research'
             |    ELSE 'research-workflow-events'
             |  END AS topic
             |FROM (VALUES ${Schemas.eventTypes.map(e => s"('$e')").mkString(",")},('unknown_event')) AS t(event_type)
             |ORDER BY event_type""".stripMargin)),

    "p6_rlike_filter" -> Q(
      (s, d) => TestData.events(s, d)
        .filter(col("event_type").rlike("^(purchase|signup)$"))
        .select(col("event_id"), col("event_type"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, event_type FROM events
             |WHERE regexp_matches(event_type, '^(purchase|signup)$')
             |ORDER BY event_id""".stripMargin)),

    "p7_projection_rename" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id").as("id"), col("lang").as("language"),
          GraftFunctions.normalizePath(col("source")).as("source_path"))
        .orderBy(col("id")),
      Some("""SELECT doc_id AS id, lang AS language,
             |  CASE WHEN source IS NULL OR starts_with(source, '/') THEN source ELSE '/' || source END AS source_path
             |FROM documents ORDER BY id""".stripMargin)),

    // ── J: joins ─────────────────────────────────────────────────────────
    "j1_join_agg" -> Q(
      (s, d) => T(s, d, "orders")
        .join(T(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    "j2_union_kind" -> Q(
      (s, d) => Relational.unionKind(
          T(s, d, "customer").select(col("c_name").as("name"), col("c_acctbal").as("acctbal")),
          "customer",
          T(s, d, "supplier").select(col("s_name").as("name"), col("s_acctbal").as("acctbal")),
          "supplier")
        .orderBy(col("kind"), col("name")),
      Some("""SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
             |UNION ALL
             |SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier
             |ORDER BY kind, name""".stripMargin)),

    // anti-join guard against the URGENT subset: every customer in the
    // fixture has SOME order, so the unfiltered form returns 0 rows and
    // passes vacuously — this fixture has real survivors (customers with
    // no urgent order) at every SF, so the oracle row proves the guard
    // actually lets non-matches through
    "j3_anti_join" -> Q(
      (s, d) => Relational.notExisting(
          T(s, d, "customer"),
          T(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
            .withColumnRenamed("o_custkey", "c_custkey"),
          Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    "j4_semi_join" -> Q(
      (s, d) => Relational.existing(
          T(s, d, "customer"), T(s, d, "orders").withColumnRenamed("o_custkey", "c_custkey"),
          Seq("c_custkey"))
        .select(col("c_custkey"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    "j5_fk_join" -> Q(
      (s, d) => T(s, d, "lineitem")
        .join(T(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand")),
      Some("""SELECT p_brand, count(*) AS n_lines,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // ── A: aggregations ──────────────────────────────────────────────────
    "a1_next_sequence" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("user_id"))
        .agg(coalesce(max(col("event_id")) + 1, lit(0L)).as("next_seq"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, CAST(coalesce(max(event_id) + 1, 0) AS BIGINT) AS next_seq
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    "a2_count_predicate" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_total"),
          count(when(col("value") > 100.0, 1)).as("n_big"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n_total,
             |  count(*) FILTER (WHERE value > 100.0) AS n_big
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "a4_string_agg" -> Q(
      (s, d) => T(s, d, "documents")
        .groupBy(col("lang"))
        .agg(concat_ws(",", array_sort(collect_set(col("source")))).as("sources"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang")),
      Some("""WITH s AS (SELECT DISTINCT lang, source FROM documents),
             |agg AS (SELECT lang, string_agg(source, ',' ORDER BY source) AS sources FROM s GROUP BY lang),
             |cnt AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
             |SELECT agg.lang AS lang, sources, n_docs FROM agg JOIN cnt USING (lang) ORDER BY lang""".stripMargin)),

    // ── W: windows / ordered scans ───────────────────────────────────────
    "w1_sequence_next" -> Q(
      (s, d) => Relational.sequenceAndNext(
          TestData.events(s, d), "user_id", "event_id", Seq(col("event_id")))
        .select(col("user_id"), col("event_id"), col("sequence"), col("next_id"))
        .orderBy(col("user_id"), col("sequence")),
      Some("""SELECT user_id, event_id,
             |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS sequence,
             |  lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS next_id
             |FROM events ORDER BY user_id, sequence""".stripMargin)),

    "w2_top1_per_group" -> Q(
      (s, d) => Relational.top1PerGroup(
          TestData.events(s, d), "user_id", Seq(col("event_id").desc))
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, event_id, event_type FROM (
             |  SELECT user_id, event_id, event_type,
             |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
             |  FROM events) t WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    "w3_ordered_scan" -> Q(
      (s, d) => TestData.events(s, d)
        .orderBy(col("event_id"))
        .limit(100)
        .select(col("event_id"), col("event_type"), col("value")),
      Some("""SELECT event_id, event_type, value FROM events
             |ORDER BY event_id LIMIT 100""".stripMargin)),

    "w4_pagination" -> Q(
      (s, d) => Relational.paginate(
          T(s, d, "orders"), Seq(col("o_orderdate").desc, col("o_orderkey").desc), 10, 20)
        .select(col("o_orderkey"), col("o_totalprice"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms")),
      Some("""SELECT o_orderkey, o_totalprice, epoch_ms(o_orderdate) AS order_ms
             |FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC
             |LIMIT 20 OFFSET 10""".stripMargin)),

    // W4's 100 TB listing path (round-12): keyset/seek pagination — the
    // page after a fixed (date, key) cursor. Same ordering as
    // w4_pagination; the boundary is a pushable predicate instead of an
    // O(offset) skip (RelationalSpec pins page-equivalence with the
    // offset path for a cursor taken from row `offset`).
    "w4b_keyset_page" -> Q(
      (s, d) => Relational.paginateAfter(
          T(s, d, "orders"),
          Seq("o_orderdate" -> false, "o_orderkey" -> false),
          Seq(lit("1997-06-15").cast("date"), lit(3000L)), 20)
        .select(col("o_orderkey"), col("o_totalprice"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms")),
      Some("""SELECT o_orderkey, o_totalprice, epoch_ms(o_orderdate) AS order_ms
             |FROM orders
             |WHERE o_orderdate < DATE '1997-06-15'
             |   OR (o_orderdate = DATE '1997-06-15' AND o_orderkey < 3000)
             |ORDER BY o_orderdate DESC, o_orderkey DESC
             |LIMIT 20""".stripMargin)),

    "w5_topk_score" -> Q(
      (s, d) => Relational.topK(
          TestData.events(s, d), Seq(col("value").desc, col("event_id")), 10)
        .select(col("event_id"), col("value")),
      Some("""SELECT event_id, value FROM events
             |ORDER BY value DESC, event_id LIMIT 10""".stripMargin)),

    "w7_topk_per_group" -> Q(
      (s, d) => Relational.topKPerGroup(
          TestData.events(s, d), "event_type",
          Seq(col("value").desc, col("event_id")), 3)
        .select(col("event_type"), col("event_id"), col("value"))
        .orderBy(col("event_type"), col("value").desc, col("event_id")),
      Some("""SELECT event_type, event_id, value FROM (
             |  SELECT event_type, event_id, value,
             |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
             |  FROM events) t WHERE rn <= 3
             |ORDER BY event_type, value DESC, event_id""".stripMargin)),

    // ranking-function family over one window (single shuffle, all five
    // functions share the sort)
    "w8_rank_funcs" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
        TestData.events(s, d)
          .filter(col("user_id") <= 20)
          .select(col("event_type"), col("event_id"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            round(percent_rank().over(w), 6).as("prnk"),
            ntile(4).over(w).as("quartile"),
            round(cume_dist().over(w), 6).as("cdist"))
          .orderBy(col("event_type"), col("rnk"), col("event_id"))
      },
      Some("""SELECT event_type, event_id,
             |  CAST(rank() OVER w AS INT) AS rnk,
             |  CAST(dense_rank() OVER w AS INT) AS drnk,
             |  round(percent_rank() OVER w, 6) AS prnk,
             |  CAST(ntile(4) OVER w AS INT) AS quartile,
             |  round(cume_dist() OVER w, 6) AS cdist
             |FROM events WHERE user_id <= 20
             |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
             |ORDER BY event_type, rnk, event_id""".stripMargin)),

    "a5_count_distinct" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "a6_rollup" -> Q(
      (s, d) => T(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // UNPIVOT (wide metrics → long): the inverse of p8_pivot, portable
    // oracle via UNION ALL
    "p10_unpivot" -> Q(
      (s, d) => T(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).cast("double").as("n_orders"),
          dsum(col("o_totalprice")).as("total_price"))
        .unpivot(Array(col("o_orderstatus")),
          Array(col("n_orders"), col("total_price")), "metric", "value")
        .orderBy(col("o_orderstatus"), col("metric")),
      Some("""SELECT o_orderstatus, metric, value FROM (
             |  SELECT o_orderstatus, 'n_orders' AS metric, CAST(count(*) AS DOUBLE) AS value
             |  FROM orders GROUP BY o_orderstatus
             |  UNION ALL
             |  SELECT o_orderstatus, 'total_price',
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |  FROM orders GROUP BY o_orderstatus) t
             |ORDER BY o_orderstatus, metric""".stripMargin)),

    // time-series gap filling: dense daily spine per user (sequence +
    // explode), zero-filled counts — the feature-engineering prerequisite
    // for any windowed model input
    "x7_gap_fill" -> Q(
      (s, d) => {
        val daily = TestData.events(s, d)
          .filter(col("user_id") <= 10)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val bounds = daily.groupBy(col("user_id"))
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        val spine = bounds.select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY"))).as("day"))
        spine.join(daily, Seq("user_id", "day"), "left")
          .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day_str"),
            coalesce(col("n"), lit(0L)).as("n_events"))
          .orderBy(col("user_id"), col("day_str"))
      },
      Some("""WITH daily AS (
             |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
             |  FROM events WHERE user_id <= 10 GROUP BY 1, 2),
             |bounds AS (
             |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
             |spine AS (
             |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM bounds)
             |SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day_str,
             |  coalesce(n, 0) AS n_events
             |FROM spine s LEFT JOIN daily USING (user_id, day)
             |ORDER BY user_id, day_str""".stripMargin)),

    // regexp_extract_all: all digit runs per document, joined (array output
    // flattened so the hash compare is scalar)
    "f21_regexp_extract_all" -> Q(
      (s, d) => T(s, d, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          concat_ws(",", expr("regexp_extract_all(text, '[0-9]+', 0)")).as("digit_runs"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  coalesce(list_aggregate(regexp_extract_all(text, '[0-9]+', 0), 'string_agg', ','), '') AS digit_runs
             |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin)),

    // boolean aggregates (every/any) per group
    "a15_bool_agg" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          every(col("value") >= 0.0).as("all_nonneg"),
          some(col("value") > 190.0).as("any_large"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  bool_and(value >= 0.0) AS all_nonneg,
             |  bool_or(value > 190.0) AS any_large
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // median per group (interpolated, matches DuckDB's even-count average)
    "a13_median" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("event_type"))
        .agg(round(median(col("value")), 6).as("med"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, round(median(value), 6) AS med
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // mergeable quantile sketch (approx_percentile, the GK/KLL-family
    // structure Spark merges across partitions): sketch internals are
    // engine-specific, so — like the HLL queries — the oracle checks the
    // bounded-error claim as an exact boolean. accuracy=10000 ⇒ rank error
    // ≤ 1/10000; the returned value must sit inside the SYMMETRIC
    // ±1%-relative rank window [0.891, 0.909] (round-11 advisory: the
    // previous (0.889, 0.901) bounds were asymmetric, with only +0.001
    // rank of upper headroom), i.e. ~90× the sketch's bound on each side,
    // checked against exact inverse-CDF bounds both engines compute
    // identically. Explicit cross-partition MERGE coverage lives in
    // a19_kll_sketch_merge.
    "a18_quantile_sketch" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d)
        val approx = ev.groupBy(col("event_type"))
          .agg(percentile_approx(col("value"), lit(0.9), lit(10000)).as("p90_approx"),
            expr("percentile(value, array(0.891, 0.909))").as("bounds"),
            count(lit(1)).as("n"))
        approx.select(col("event_type"), col("n"),
            (col("p90_approx") >= element_at(col("bounds"), 1) - 1e-9 &&
             col("p90_approx") <= element_at(col("bounds"), 2) + 1e-9)
              .as("within_1pct_rank"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  TRUE AS within_1pct_rank
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // KLL quantile sketches (Apache DataSketches) with an EXPLICIT merge:
    // per-DAY sketches combine via kll_merge_agg into the per-type rollup
    // WITHOUT rescanning — a12_hll_mergeable's incremental pattern for
    // quantiles (round-11: a18 asserted mergeability; this exercises it).
    // k=1000 ⇒ 99%-confidence normalized rank error ~0.5%; the merged p90
    // must land inside the exact ±1%-relative rank window, a boolean the
    // oracle verifies exactly.
    "a19_kll_sketch_merge" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(expr("kll_sketch_agg_double(value, 1000)").as("sk"))
        .groupBy(col("event_type"))
        .agg(expr("kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.9)")
            .as("p90_merged"),
          count(lit(1)).as("n_daily_sketches"))
        .join(TestData.events(s, d).groupBy(col("event_type"))
            .agg(expr("percentile(value, array(0.891, 0.909))").as("bounds"),
              count(lit(1)).as("n")),
          Seq("event_type"))
        .select(col("event_type"), col("n"), col("n_daily_sketches"),
          (col("p90_merged") >= element_at(col("bounds"), 1) - 1e-9 &&
           col("p90_merged") <= element_at(col("bounds"), 2) + 1e-9)
            .as("within_1pct_rank"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n,
             |  count(DISTINCT CAST(ts AS DATE)) AS n_daily_sketches,
             |  TRUE AS within_1pct_rank
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // exact equi-width histogram: bucket = floor((x−lo)·k/(hi−lo)) clamped
    // to k−1 — pure integer/double arithmetic both engines replay exactly,
    // the profile primitive behind drift monitors and dashboards. Bounds
    // come from one aggregate pass (broadcast scalar), counts from one
    // keyed shuffle — two passes total, no window.
    "x18_histogram" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d).filter(col("value").isNotNull)
        val bounds = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
        ev.crossJoin(broadcast(bounds))
          .select(least(floor((col("value") - col("lo")) * 8 / (col("hi") - col("lo"))), lit(7L))
            .cast("int").as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_rows"))
          .orderBy(col("bucket"))
      },
      Some("""WITH b AS (SELECT min(value) AS lo, max(value) AS hi
             |           FROM events WHERE value IS NOT NULL)
             |SELECT CAST(least(floor((value - lo) * 8 / (hi - lo)), 7) AS INT) AS bucket,
             |  count(*) AS n_rows
             |FROM events, b WHERE value IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // second-moment statistics battery (stddev / correlation / covariance)
    "a14_stats_moments" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(stddev_samp(col("value")), 4).as("sd"),
          round(corr(col("value"), col("user_id").cast("double")), 4).as("r"),
          round(covar_samp(col("value"), col("user_id").cast("double")), 4).as("cov"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  round(stddev_samp(value), 4) AS sd,
             |  round(corr(value, CAST(user_id AS DOUBLE)), 4) AS r,
             |  round(covar_samp(value, CAST(user_id AS DOUBLE)), 4) AS cov
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // EXISTS / NOT EXISTS through the SQL surface (Catalyst plans them as
    // semi/anti joins — pinned DataFrame twins are j3/j2)
    "j7_exists_sql" -> Q(
      (s, d) => {
        T(s, d, "customer").createOrReplaceTempView("customer_ex")
        T(s, d, "orders").createOrReplaceTempView("orders_ex")
        s.sql("""SELECT c_custkey FROM customer_ex c
                |WHERE EXISTS (SELECT 1 FROM orders_ex o WHERE o.o_custkey = c.c_custkey
                |              AND o.o_totalprice > 300000)
                |  AND NOT EXISTS (SELECT 1 FROM orders_ex o WHERE o.o_custkey = c.c_custkey
                |                  AND o.o_orderstatus = 'F')
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
             |              AND o.o_totalprice > 300000)
             |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
             |                  AND o.o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)),

    // Bloom-prune join: the big side is filtered through a bloom sketch of
    // the small side's keys BEFORE the join — the manual runtime filter for
    // un-broadcastable dims. Oracle is the PLAIN join: false positives are
    // eliminated by the join, so the results are exactly equal.
    "j8_bloom_prune" -> Q(
      (s, d) => {
        val li = T(s, d, "lineitem")
        val parts = T(s, d, "part").filter(col("p_brand") === "Brand#23")
        graft.ops.Relational.bloomPruneJoin(
            li, parts, "l_partkey", "p_partkey", expectedItems = 1 << 14)
          .groupBy(col("p_size"))
          .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("p_size"))
      },
      Some("""SELECT p_size, count(*) AS n_items,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand = 'Brand#23'
             |GROUP BY p_size ORDER BY p_size""".stripMargin)),

    // RANGE-frame window: events in the trailing hour per user — value-based
    // frames (vs w6's row-based), the sliding-window primitive for rate
    // features
    "x10_range_frame" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ms"))
          .rangeBetween(-3600000L, 0L)
        TestData.events(s, d)
          .filter(col("user_id") <= 20)
          .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(w).as("n_last_hour"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, n_last_hour FROM (
             |  SELECT user_id, event_id,
             |    count(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP))
             |                   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS n_last_hour
             |  FROM events WHERE user_id <= 20) t
             |ORDER BY user_id, event_id""".stripMargin)),

    // LOCF imputation (carry the last observation forward): the standard
    // fill for sparse sensor/feature series — last(ignoreNulls) over an
    // unbounded-preceding window, one shuffle
    "x8_locf_impute" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        TestData.events(s, d)
          .filter(col("user_id") <= 20)
          // sparsify deterministically: only purchases keep their value
          .withColumn("sparse",
            when(col("event_type") === "purchase", col("value")))
          .select(col("user_id"), col("event_id"),
            last(col("sparse"), ignoreNulls = true).over(w).as("locf_value"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
             |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             |    OVER (PARTITION BY user_id ORDER BY event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
             |FROM events WHERE user_id <= 20
             |ORDER BY user_id, event_id""".stripMargin)),

    // correlated scalar subquery through the SQL surface (Catalyst rewrites
    // it to an aggregate + join — the plan a 100 TB run needs, not a
    // per-row loop)
    "x9_correlated_subquery" -> Q(
      (s, d) => {
        T(s, d, "orders").createOrReplaceTempView("orders_cs")
        // price > 2*avg, cross-multiplied so the comparison is decimal-exact
        // (no engine-dependent double summation order at the boundary)
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
                |FROM orders_cs o
                |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
                |      (SELECT count(*) FROM orders_cs i WHERE i.o_custkey = o.o_custkey)
                |    > 2 * (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
                |           FROM orders_cs i WHERE i.o_custkey = o.o_custkey)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders o
             |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
             |      (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
             |    > 2 * (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
             |           FROM orders i WHERE i.o_custkey = o.o_custkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // full-outer join: per-nation supplier vs customer counts, null-filled
    // on either side (join family completeness: inner/left/semi/anti
    // elsewhere, outer here)
    "j6_full_outer" -> Q(
      (s, d) => {
        val sup = T(s, d, "supplier").groupBy(col("s_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_sup"))
        val cust = T(s, d, "customer").groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_cust"))
        sup.join(cust, Seq("nk"), "full_outer")
          .select(col("nk"), coalesce(col("n_sup"), lit(0L)).as("n_sup"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"))
          .orderBy(col("nk"))
      },
      Some("""SELECT coalesce(s.nk, c.nk) AS nk,
             |  coalesce(n_sup, 0) AS n_sup, coalesce(n_cust, 0) AS n_cust
             |FROM (SELECT s_nationkey AS nk, count(*) AS n_sup FROM supplier GROUP BY 1) s
             |FULL OUTER JOIN (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
             |  ON s.nk = c.nk
             |ORDER BY nk""".stripMargin)),

    // null semantics: null-safe equality (<=> / IS NOT DISTINCT FROM),
    // coalesce/nullif, and null-aware counting in one battery row
    "p9_null_semantics" -> Q(
      (s, d) => {
        val e = T(s, d, "embeddings")
        e.select(col("vec_id"),
            (col("embedding") <=> lit(null)).as("is_null_safe"),
            coalesce(size(col("embedding")), lit(-1)).as("dim_or_default"),
            nullif(size(col("embedding")).cast("int"), lit(-1)).isNull.as("nullif_hit"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id,
             |  (embedding IS NOT DISTINCT FROM NULL) AS is_null_safe,
             |  coalesce(CAST(len(embedding) AS INT), -1) AS dim_or_default,
             |  (nullif(CAST(len(embedding) AS INT), -1) IS NULL) AS nullif_hit
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // string pad/case/edit battery (F-family widening)
    "f19_string_ops" -> Q(
      (s, d) => T(s, d, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          lpad(col("doc_id").cast("string"), 6, "0").as("padded_id"),
          reverse(substring(col("text"), 1, 10)).as("rev10"),
          translate(substring(col("text"), 1, 20), "aeiou", "AEIOU").as("vowels_up"),
          repeat(lit("-"), 5).as("dashes"),
          upper(substring(col("source"), 1, 3)).as("src_upper"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
             |  reverse(substr(text, 1, 10)) AS rev10,
             |  translate(substr(text, 1, 20), 'aeiou', 'AEIOU') AS vowels_up,
             |  repeat('-', 5) AS dashes,
             |  upper(substr(source, 1, 3)) AS src_upper
             |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin)),

    // as-of join (composed operator Spark lacks) vs DuckDB's NATIVE ASOF
    "x1_asof_join" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d)
        val probes = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"))
        val state = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_millis(col("ts")).as("sms"), col("value"))
          .groupBy(col("user_id"), col("sms")).agg(max(col("value")).as("price"))
        Relational.asofJoin(probes, state, "user_id", "ms", "sms", Seq("price"))
          .select(col("event_id"), col("user_id"), col("ms"), col("price"))
          .orderBy(col("event_id"))
      },
      Some("""WITH probes AS (
             |  SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
             |  FROM events WHERE event_type = 'view'),
             |state AS (
             |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS sms, max(value) AS price
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT p.event_id, p.user_id, p.ms, s.price
             |FROM probes p ASOF LEFT JOIN state s
             |  ON p.user_id = s.user_id AND p.ms >= s.sms
             |ORDER BY p.event_id""".stripMargin)),

    // CUSUM changepoint detection (round-11, Page 1954): the positive-
    // shift detector S_i = max(0, S_{i-1} + (x_i − μ − k)), alarm at
    // S > h — the drift monitor over metric streams. The recursion is NOT
    // window-expressible directly, but the classic reset identity
    // S_i = W_i − min_{j≤i} W_j (W = cumsum of the drift-adjusted series)
    // turns it into two stacked running frames over ONE per-key sort —
    // a single shuffle, no recursion, no UDF. Running sums evaluate
    // left-to-right in both engines, so the doubles match bitwise.
    "x20_cusum" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val (mu, k, h) = (49.63, 25.0, 150.0)
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        TestData.events(s, d)
          .filter(col("user_id") <= 20 && col("value").isNotNull)
          .select(col("user_id"), col("event_id"), col("value"))
          .withColumn("__w", sum(col("value") - lit(mu) - lit(k)).over(w))
          .withColumn("__s", col("__w") - min(col("__w")).over(w))
          .select(col("user_id"), col("event_id"),
            round(col("__s"), 6).as("cusum"),
            (col("__s") > h).as("alarm"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH base AS (SELECT user_id, event_id, value FROM events
             |              WHERE user_id <= 20 AND value IS NOT NULL),
             |cw AS (SELECT user_id, event_id,
             |    sum(value - 49.63 - 25.0) OVER (PARTITION BY user_id
             |      ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS w
             |  FROM base),
             |c AS (SELECT user_id, event_id, w,
             |    min(w) OVER (PARTITION BY user_id ORDER BY event_id
             |                 ROWS UNBOUNDED PRECEDING) AS mw
             |  FROM cw)
             |SELECT user_id, event_id, round(w - mw, 6) AS cusum,
             |  (w - mw) > 150.0 AS alarm
             |FROM c ORDER BY user_id, event_id""".stripMargin)),

    // nearest as-of (round-11): closest state row in EITHER direction,
    // ties to the past — one union + one shuffle serving both carry
    // frames; oracle picks per probe via min |Δ| window with the same
    // tie rule
    "x1c_asof_nearest" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d)
        val probes = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"))
        val state = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_millis(col("ts")).as("sms"), col("value"))
          .groupBy(col("user_id"), col("sms")).agg(max(col("value")).as("price"))
        Relational.asofJoinNearest(probes, state, "user_id", "ms", "sms",
            Seq("price"))
          .select(col("event_id"), col("user_id"), col("ms"), col("sms"),
            col("price"))
          .orderBy(col("event_id"))
      },
      Some("""WITH probes AS (
             |  SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
             |  FROM events WHERE event_type = 'view'),
             |state AS (
             |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS sms, max(value) AS price
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |cand AS (SELECT p.event_id, p.user_id, p.ms, s.sms, s.price,
             |    row_number() OVER (PARTITION BY p.event_id
             |      ORDER BY abs(p.ms - s.sms),
             |               CASE WHEN s.sms <= p.ms THEN 0 ELSE 1 END) AS rn
             |  FROM probes p JOIN state s ON p.user_id = s.user_id)
             |SELECT p.event_id, p.user_id, p.ms, c.sms, c.price
             |FROM probes p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
             |  ON p.event_id = c.event_id
             |ORDER BY p.event_id""".stripMargin)),

    // forward as-of (nearest FUTURE state row) vs DuckDB's native ASOF with
    // the comparison reversed
    "x1b_asof_forward" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d)
        val probes = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"))
        val state = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_millis(col("ts")).as("sms"), col("value"))
          .groupBy(col("user_id"), col("sms")).agg(max(col("value")).as("price"))
        Relational.asofJoinForward(probes, state, "user_id", "ms", "sms", Seq("price"))
          .select(col("event_id"), col("user_id"), col("ms"), col("price"))
          .orderBy(col("event_id"))
      },
      Some("""WITH probes AS (
             |  SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
             |  FROM events WHERE event_type = 'view'),
             |state AS (
             |  SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS sms, max(value) AS price
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT p.event_id, p.user_id, p.ms, s.price
             |FROM probes p ASOF LEFT JOIN state s
             |  ON p.user_id = s.user_id AND p.ms <= s.sms
             |ORDER BY p.event_id""".stripMargin)),

    "x2_sessionize" -> Q(
      (s, d) => Relational.sessionize(
          TestData.events(s, d)
            .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms")),
          "user_id", "ms", gap = 3600000L, tieBreak = Seq(col("event_id")))
        .select(col("event_id"), col("user_id"), col("session_id"))
        .orderBy(col("event_id")),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
             |flags AS (SELECT event_id, user_id, ms,
             |    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 3600000 THEN 1 ELSE 0 END AS is_new
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id))
             |SELECT event_id, user_id,
             |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
             |                         ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
             |FROM flags ORDER BY event_id""".stripMargin)),

    "x3_range_join" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d)
        val probes = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"),
            unix_millis(col("ts")).as("ms"))
        val intervals = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            unix_millis(col("ts")).as("p_start"),
            (unix_millis(col("ts")) + 1800000L).as("p_end"))
        Relational.rangeJoinBinned(probes, intervals, "ms", "p_start", "p_end",
            binWidth = 1800000L, keyCol = Some("user_id"))
          .select(col("view_id"), col("purchase_id"), col("user_id"))
          .orderBy(col("view_id"), col("purchase_id"))
      },
      Some("""WITH probes AS (
             |  SELECT event_id AS view_id, user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
             |  FROM events WHERE event_type = 'view'),
             |intervals AS (
             |  SELECT event_id AS purchase_id, user_id,
             |    epoch_ms(CAST(ts AS TIMESTAMP)) AS p_start,
             |    epoch_ms(CAST(ts AS TIMESTAMP)) + 1800000 AS p_end
             |  FROM events WHERE event_type = 'purchase')
             |SELECT view_id, purchase_id, p.user_id AS user_id
             |FROM probes p JOIN intervals i
             |  ON p.user_id = i.user_id AND p.ms BETWEEN i.p_start AND i.p_end
             |ORDER BY view_id, purchase_id""".stripMargin)),

    // ── U: set ops ───────────────────────────────────────────────────────
    "u2_intersect" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d)
        ev.filter(col("event_type") === "view").select(col("user_id")).distinct()
          .intersect(ev.filter(col("event_type") === "click").select(col("user_id")).distinct())
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id FROM (
             |  (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
             |  INTERSECT
             |  (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')) t
             |ORDER BY user_id""".stripMargin)),

    // EXCEPT at (user, day) grain: every fixture user has every event type
    // overall, so the user-grain form returns 0 rows (a vacuous pass) —
    // view-days without a same-day purchase survive at every SF
    "u1_except" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d)
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
          .except(ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), to_date(col("ts")).as("day")).distinct())
          .orderBy(col("user_id"), col("day"))
      },
      Some("""SELECT user_id, day FROM (
             |  (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'view')
             |  EXCEPT
             |  (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase')) t
             |ORDER BY user_id, day""".stripMargin)),

    // ── F: scalar functions ──────────────────────────────────────────────
    "f1_title_extract" -> Q(
      (s, d) => T(s, d, "documents")
        .withColumn("md", concat(lit("# Doc "), col("doc_id").cast("string"), lit(NL), col("text")))
        .select(col("doc_id"), GraftFunctions.extractTitle(col("md")).as("title"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CASE WHEN length(t) > 0 THEN t END AS title FROM (
             |  SELECT doc_id,
             |    trim(regexp_extract('# Doc ' || doc_id || chr(10) || text, '(?m)^#\s+(.*?)\s*$', 1)) AS t
             |  FROM documents) x ORDER BY doc_id""".stripMargin)),

    "f2_string_suite" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          GraftFunctions.truncateText(col("text"), 50).as("snippet"),
          GraftFunctions.normalizePath(col("source")).as("src_path"),
          GraftFunctions.isNonBlank(col("text")).as("valid"),
          concat_ws("-", col("source"), lit("doc"), col("doc_id").cast("string")).as("syn_id"),
          length(col("text")).as("text_len"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CASE WHEN length(text) > 50 THEN substr(text, 1, 50) || '...' ELSE text END AS snippet,
             |  CASE WHEN source IS NULL OR starts_with(source, '/') THEN source ELSE '/' || source END AS src_path,
             |  length(trim(coalesce(text, ''))) > 0 AS valid,
             |  concat_ws('-', source, 'doc', doc_id) AS syn_id,
             |  CAST(length(text) AS INT) AS text_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "f10_json_extract" -> Q(
      (s, d) => TestData.events(s, d)
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    "f13_kv_parse" -> Q(
      (s, d) => TestData.events(s, d)
        .withColumn("kv", concat(col("event_type"), lit("="), col("user_id").cast("string")))
        .select(col("event_id"),
          element_at(split(col("kv"), "=", 2), 1).as("key"),
          element_at(split(col("kv"), "=", 2), 2).as("val"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  str_split(event_type || '=' || user_id, '=')[1] AS key,
             |  str_split(event_type || '=' || user_id, '=')[2] AS val
             |FROM events ORDER BY event_id""".stripMargin)),

    // ── V: vector / RAG ──────────────────────────────────────────────────
    "v2_chunk_text" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        T(s, d, "documents")
          .select(col("doc_id"), GraftFunctions.chunkText(col("text"), 40, 10))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""SELECT doc_id, CAST(s // 30 AS INT) AS chunk_idx, CAST(s AS INT) AS chunk_start,
             |  substr(text, CAST(s + 1 AS INT), 40) AS chunk
             |FROM (SELECT doc_id, text,
             |        unnest(CASE WHEN length(text) <= 40 THEN [CAST(0 AS BIGINT)]
             |               ELSE range(0, length(text), 30) END) AS s
             |      FROM documents) t
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    "v3_knn_cosine" -> Q(
      (s, d) => {
        val q = queryVec(s, d)
        Rag.knn(TestData.embeddings(s, d).filter(col("vec_id") =!= 0),
            "vec_id", "embedding", q, k = 10, minScore = 0.0)
          .select(col("vec_id"), round(col("score"), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
      },
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
             |pairs AS (SELECT e.vec_id AS vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
             |          FROM embeddings e, q WHERE e.vec_id <> 0),
             |scores AS (SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS s
             |           FROM pairs GROUP BY vec_id),
             |topk AS (SELECT vec_id, s FROM scores ORDER BY s DESC, vec_id LIMIT 10)
             |SELECT vec_id, round(s, 6) AS score FROM topk WHERE s >= 0.0
             |ORDER BY score DESC, vec_id""".stripMargin)),

    // Batch KNN join (round-13): 20 query vectors × the rest of the corpus
    // in ONE corpus scan — broadcast query batch, codegen'd cosine,
    // rank-≤-k window (WindowGroupLimit prunes map-side). Oracle replays
    // the |Q|×|C| score matrix exactly via the v3 unnest-to-double chain.
    "v11_knn_join" -> Q(
      (s, d) => {
        val emb = TestData.embeddings(s, d).filter(col("embedding").isNotNull)
        Rag.knnJoin(
            emb.filter(col("vec_id") < 20), "vec_id", "embedding",
            emb.filter(col("vec_id") >= 20), "vec_id", "embedding", k = 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
             |           FROM embeddings WHERE vec_id < 20 AND embedding IS NOT NULL),
             |c AS (SELECT vec_id, embedding FROM embeddings
             |      WHERE vec_id >= 20 AND embedding IS NOT NULL),
             |pairs AS (SELECT q.query_id, c.vec_id,
             |            unnest(c.embedding)::DOUBLE AS x,
             |            unnest(q.qv)::DOUBLE AS y
             |          FROM c, q),
             |scores AS (SELECT query_id, vec_id,
             |             round(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS score
             |           FROM pairs GROUP BY 1, 2),
             |ranked AS (SELECT query_id, vec_id, score,
             |             CAST(row_number() OVER (PARTITION BY query_id
             |               ORDER BY score DESC, vec_id) AS INT) AS rank
             |           FROM scores WHERE score IS NOT NULL)
             |SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= 5
             |ORDER BY query_id, rank""".stripMargin)),

    // Matryoshka-style truncated retrieval (round-12): cosine over the
    // FIRST 16 of 64 dims — the MRL cost dial (4x less arithmetic and
    // index memory per probe; with MRL-trained embeddings the prefix is
    // the coarse representation by construction, and a full-dim rerank
    // of the prefix top-k recovers the rest). Pure composition: slice +
    // the same codegen'd cosine + TakeOrderedAndProject; cosine
    // renormalizes, so no explicit renorm of the prefix is needed.
    "v10_mrl_knn" -> Q(
      (s, d) => {
        val q16 = queryVec(s, d).take(16)
        Rag.knn(TestData.embeddings(s, d).filter(col("vec_id") =!= 0)
            .withColumn("emb16", slice(col("embedding"), 1, 16)),
            "vec_id", "emb16", q16, k = 10, minScore = -1.0)
          .select(col("vec_id"), round(col("score"), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
      },
      Some("""WITH q AS (SELECT embedding[1:16] AS qv FROM embeddings WHERE vec_id = 0),
             |pairs AS (SELECT e.vec_id AS vec_id, unnest(e.embedding[1:16])::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
             |          FROM embeddings e, q WHERE e.vec_id <> 0),
             |scores AS (SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS s
             |           FROM pairs GROUP BY vec_id),
             |topk AS (SELECT vec_id, s FROM scores ORDER BY s DESC, vec_id LIMIT 10)
             |SELECT vec_id, round(s, 6) AS score FROM topk
             |ORDER BY score DESC, vec_id""".stripMargin)),

    // MMR-diversified re-rank of the cosine top-20 pool: distributed
    // retrieve, bounded greedy re-rank; the oracle unrolls the greedy loop
    // into chained CTEs on the same rounded values
    "v3_mmr_rerank" -> Q(
      (s, d) => Rag.mmr(TestData.embeddings(s, d).filter(col("vec_id") =!= 0),
        "vec_id", "embedding", queryVec(s, d), k = 5, lambda = 0.7, poolSize = 20),
      Some(mmrOracleSql(k = 5, lambda = 0.7, poolSize = 20))),

    "v5_context_retrieval" -> Q(
      (s, d) => {
        GraftFunctions.register(s)
        val q = queryVec(s, d)
        val top = Rag.knn(TestData.embeddings(s, d).filter(col("vec_id") =!= 0),
          "vec_id", "embedding", q, k = 3, minScore = 0.0)
        val blocks = top.join(T(s, d, "documents"), col("vec_id") === col("doc_id"))
          .withColumn("block", concat(
            lit("Title: Doc "), col("doc_id").cast("string"), lit(NL),
            lit("Summary: "), substring(col("text"), 1, 30), lit(NL),
            lit("Content: "), GraftFunctions.truncateText(col("text"), 200), lit(NL),
            lit("(Similarity: "), round(col("score"), 2).cast("string"), lit(")")))
        blocks
          .select(struct((-col("score")).as("neg"), col("doc_id").as("id"), col("block").as("b")).as("s"))
          .agg(count(lit(1)).as("n_contexts"),
            concat_ws(SEP, transform(array_sort(collect_list(col("s"))), x => x.getField("b"))).as("context"))
          .select(col("n_contexts"), when(col("n_contexts") > 0, col("context")).as("context"))
      },
      Some(s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
             |pairs AS (SELECT e.vec_id AS vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
             |          FROM embeddings e, q WHERE e.vec_id <> 0),
             |scores AS (SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS s
             |           FROM pairs GROUP BY vec_id),
             |topk AS (SELECT vec_id, s FROM scores ORDER BY s DESC, vec_id LIMIT 3),
             |kept AS (SELECT vec_id, s FROM topk WHERE s >= 0.0),
             |blocks AS (SELECT d.doc_id, s,
             |    'Title: Doc ' || d.doc_id || chr(10) ||
             |    'Summary: ' || substr(d.text, 1, 30) || chr(10) ||
             |    'Content: ' || (CASE WHEN length(d.text) > 200 THEN substr(d.text, 1, 200) || '...' ELSE d.text END) || chr(10) ||
             |    '(Similarity: ' || CAST(round(s, 2) AS VARCHAR) || ')' AS block
             |  FROM kept JOIN documents d ON kept.vec_id = d.doc_id)
             |SELECT count(*) AS n_contexts,
             |  string_agg(block, '$SEP' ORDER BY s DESC, doc_id) AS context
             |FROM blocks""".stripMargin)),

    // ── S/D: store-semantics + status derivation (as pure queries) ───────
    "s1_merge_upsert" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d)
        val target = ev.filter(col("event_type") === "signup").groupBy(col("user_id"))
          .agg(min(unix_millis(col("ts"))).as("created_ms"))
          .select(concat(lit("wf-"), col("user_id").cast("string")).as("workflow_id"),
            lit("pending").as("t_status"), col("created_ms"))
        val source = ev.filter(col("event_type") === "purchase").groupBy(col("user_id"))
          .agg(min(unix_millis(col("ts"))).as("s_created_ms"))
          .select(concat(lit("wf-"), col("user_id").cast("string")).as("workflow_id"),
            lit("completed").as("s_status"), col("s_created_ms"))
        // MERGE: matched → update status only; not-matched → insert source row
        target.join(source, Seq("workflow_id"), "full_outer")
          .select(col("workflow_id"),
            coalesce(col("s_status"), col("t_status")).as("status"),
            coalesce(col("created_ms"), col("s_created_ms")).as("created_ms"))
          .orderBy(col("workflow_id"))
      },
      Some("""WITH target AS (
             |  SELECT 'wf-' || user_id AS workflow_id, 'pending' AS t_status,
             |         min(epoch_ms(CAST(ts AS TIMESTAMP))) AS created_ms
             |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
             |source AS (
             |  SELECT 'wf-' || user_id AS workflow_id, 'completed' AS s_status,
             |         min(epoch_ms(CAST(ts AS TIMESTAMP))) AS s_created_ms
             |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
             |SELECT coalesce(t.workflow_id, s.workflow_id) AS workflow_id,
             |  coalesce(s_status, t_status) AS status,
             |  coalesce(created_ms, s_created_ms) AS created_ms
             |FROM target t FULL OUTER JOIN source s USING (workflow_id)
             |ORDER BY workflow_id""".stripMargin)),

    "s2_status_update" -> Q(
      (s, d) => TestData.events(s, d)
        .filter(col("event_type") === "signup").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(concat(lit("wf-"), col("user_id").cast("string")).as("workflow_id"),
          when(col("user_id") === 7, lit("ended")).otherwise(lit("pending")).as("status"))
        .orderBy(col("workflow_id")),
      Some("""SELECT 'wf-' || user_id AS workflow_id,
             |  CASE WHEN user_id = 7 THEN 'ended' ELSE 'pending' END AS status
             |FROM (SELECT user_id, count(*) AS n FROM events WHERE event_type = 'signup' GROUP BY user_id) t
             |ORDER BY workflow_id""".stripMargin)),

    "d7_status_derivation" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type") === "click", 1)).as("n_click"))
        .select(col("user_id"),
          when(col("n_purchase") > 0, lit("completed"))
            .when(col("n_click") > 3, lit("researching"))
            .otherwise(lit("pending")).as("status"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  CASE WHEN n_purchase > 0 THEN 'completed'
             |       WHEN n_click > 3 THEN 'researching'
             |       ELSE 'pending' END AS status
             |FROM (SELECT user_id,
             |        count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
             |        count(*) FILTER (WHERE event_type = 'click') AS n_click
             |      FROM events GROUP BY user_id) t
             |ORDER BY user_id""".stripMargin)),

    // ── T5 extension: event-time hourly rollup (batch form) ──────────────
    "t5_hourly_rollup" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .orderBy(col("hour_ms"), col("event_type")),
      Some("""SELECT epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_ms, event_type,
             |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY hour_ms, event_type""".stripMargin))
  )
}
