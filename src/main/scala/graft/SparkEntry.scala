package graft

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

/**
 * Driver contract (SURVEY.md §7): `entry` = flagship smoke query,
 * `queries` = one entry per implemented operator from SURVEY.md §2,
 * `oracleSql` = the DuckDB-equivalent ANSI SQL per query key.
 *
 * Conventions that make the oracle hash-compare deterministic:
 *  - every query ends with an explicit ORDER BY mirrored in the SQL;
 *  - FP aggregations go through exact DECIMAL(18,2) sums, cast back to
 *    double (identical bits regardless of partial-agg order);
 *  - cosine scores are rounded to 6 dp on output (double accumulation
 *    error ~1e-15, so rounding is stable across engines);
 *  - nanosecond event timestamps are exposed as epoch milliseconds
 *    (Spark floor-truncates ns→µs exactly like DuckDB).
 */
object SparkEntry {

  private def T(s: SparkSession, d: String, n: String): DataFrame = TestData.table(s, d, n)

  /** Exact money/quantity aggregation: decimal sum, double on the way out. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Shared temp root for queries that materialize fixture tables
    * (snapshots, BM25 index, schema-drift batches). ONE process-wide
    * shutdown hook cleans everything; each invocation still gets a fresh
    * subdirectory so repeated runs (bench retries, contract suites) never
    * see each other's snapshot state — and never accumulate hooks. */
  private object FixtureRoot {
    private lazy val root: java.nio.file.Path = {
      val r = java.nio.file.Files.createTempDirectory("graft-fixtures")
      sys.addShutdownHook(rm(r))
      r
    }
    private def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.forEach(rm(_)) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    def fresh(prefix: String): String =
      java.nio.file.Files.createTempDirectory(root, prefix).toString
  }

  /** Fetch the query vector (vec_id = 0) — driver-side scalar by design. */
  private def queryVec(s: SparkSession, d: String): Array[Float] =
    TestData.embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  /** DuckDB twin of [[graft.rag.Rag.mmr]]: the greedy loop unrolled into k
    * chained CTEs. All comparisons run on 6-decimal-rounded rel/sim values
    * exactly as the Scala loop does, and λ / (1−λ) are interpolated from
    * the same doubles, so selection (and therefore the hash) matches. */
  private def mmrOracleSql(k: Int, lambda: Double, poolSize: Int): String = {
    val lam = lambda.toString
    val mu = (1.0 - lambda).toString
    val steps = (2 to k).map { i =>
      val prev = (1 until i).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
      s"""p$i AS (SELECT p.vec_id, p.rel,
         |  round($lam*p.rel - $mu*(SELECT max(sv) FROM sims
         |    WHERE sims.ia = p.vec_id AND sims.ib IN ($prev)), 6) AS m
         |  FROM pool p WHERE p.vec_id NOT IN ($prev)),
         |s$i AS (SELECT vec_id, rel FROM p$i ORDER BY m DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k).map(i =>
      s"SELECT vec_id, $i AS mmr_rank, rel FROM s$i").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |rel0 AS (SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
       |         FROM embeddings e, q WHERE e.vec_id <> 0),
       |relraw AS (SELECT vec_id, SUM(x*y)/(SQRT(SUM(x*x))*SQRT(SUM(y*y))) AS s
       |           FROM rel0 GROUP BY vec_id),
       |pool AS (SELECT vec_id, round(s, 6) AS rel FROM relraw
       |         ORDER BY s DESC, vec_id LIMIT $poolSize),
       |pv AS (SELECT e.vec_id, e.embedding FROM embeddings e JOIN pool p USING (vec_id)),
       |pp AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
       |         unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
       |       FROM pv a JOIN pv b ON a.vec_id < b.vec_id),
       |simh AS (SELECT ia, ib, round(SUM(x*y)/(SQRT(SUM(x*x))*SQRT(SUM(y*y))), 6) AS sv
       |         FROM pp GROUP BY ia, ib),
       |sims AS (SELECT ia, ib, sv FROM simh UNION ALL SELECT ib, ia, sv FROM simh),
       |s1 AS (SELECT vec_id, rel FROM pool ORDER BY rel DESC, vec_id LIMIT 1),
       |$steps
       |SELECT vec_id, mmr_rank, rel FROM ($out) ORDER BY mmr_rank""".stripMargin
  }

  // ────────────────────────────────────────────────────────────────────────
  /** Flagship: V5 context retrieval over documents+embeddings at sf0.001
    * (SURVEY §7.2 slice 0 — scan → cosine → top-k → threshold → truncate →
    * format → concat_ws, the exact shape of neo4j_rag.py:333-375). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    GraftFunctions.register(spark)
    val q = queryVec(spark, d)
    val results = TestData.embeddings(spark, d)
      .join(TestData.documents(spark, d), col("vec_id") === col("doc_id"))
    Rag.contextRetrieval(results, "vec_id", "embedding",
      concat(lit("Doc "), col("doc_id").cast("string")),
      substring(col("text"), 1, 30), col("text"),
      q, k = 3, minScore = 0.0, truncateAt = 2000)
  }

  // ────────────────────────────────────────────────────────────────────────

  private case class Q(fn: (SparkSession, String) => DataFrame, sql: Option[String])

  private val NL = "\n"
  private val SEP = "\n\n---\n\n"

  private def defs: Seq[(String, Q)] = Seq(

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
  ) ++ dedupDefs ++ textDefs ++ scalarDefs ++ storeDefs ++ analyticsDefs ++
    tpchDefs2 ++ graphDefs ++ curationDefs ++ advancedDefs

  /** OLAP widening: CUBE / GROUPING SETS / pivot / window frames /
    * exact percentiles / portable hash-sampling / HLL sketches. */
  private def advancedDefs: Seq[(String, Q)] = Seq(

    "a7_cube" -> Q(
      (s, d) => T(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // GROUPING SETS through the spark.sql surface (temp view + ANSI SQL) —
    // the SQL front door is part of the engine's API, so one battery entry
    // exercises it end-to-end
    "a8_grouping_sets" -> Q(
      (s, d) => {
        T(s, d, "orders").createOrReplaceTempView("orders_gs")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
                |FROM orders_gs
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
                |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
             |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // pivot with an explicit value list (never value-discovery — that's a
    // separate job at scale); counts coalesced to 0, names parquet-safe
    "p8_pivot" -> Q(
      (s, d) => {
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val piv = T(s, d, "orders")
          .groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority", prios)
          .agg(count(lit(1)))
        piv.select(col("o_orderstatus"),
            coalesce(col("`1-URGENT`"), lit(0L)).as("p_urgent"),
            coalesce(col("`2-HIGH`"), lit(0L)).as("p_high"),
            coalesce(col("`3-MEDIUM`"), lit(0L)).as("p_medium"),
            coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("p_notspec"),
            coalesce(col("`5-LOW`"), lit(0L)).as("p_low"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
             |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
             |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
             |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
             |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
             |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // window frames: running total (unbounded preceding) + centered moving
    // average (2 preceding..current) — decimal-exact so partial-agg order
    // can't change bits
    "w6_window_frames" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("event_id"))
        val run = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val mov = w.rowsBetween(-2, 0)
        TestData.events(s, d)
          .filter(col("user_id") <= 50)
          .select(col("user_id"), col("event_id"),
            sum(col("value").cast("decimal(18,2)")).over(run).cast("double").as("running_total"),
            round(sum(col("value").cast("decimal(18,2)")).over(mov).cast("double") /
              count(lit(1)).over(mov), 6).as("moving_avg"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w_run AS DOUBLE) AS running_total,
             |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w_mov AS DOUBLE)
             |        / count(*) OVER w_mov, 6) AS moving_avg
             |FROM events WHERE user_id <= 50
             |WINDOW
             |  w_run AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  w_mov AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),

    // exact interpolated percentiles (both engines: linear interpolation on
    // the sorted set; round(6) absorbs the ~1e-13 formula-order difference)
    "a9_percentiles" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  round(quantile_cont(value, 0.5), 6) AS p50,
             |  round(quantile_cont(value, 0.9), 6) AS p90
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // portable deterministic sampling: md5-prefix filter computes the SAME
    // sample membership in any engine (the scale story for "give me 1/16 of
    // 100 TB, reproducibly, no coordination")
    "x4_hash_sample" -> Q(
      (s, d) => T(s, d, "orders")
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
        .agg(count(lit(1)).as("n_sample"), dsum(col("o_totalprice")).as("sample_total")),
      Some("""SELECT count(*) AS n_sample,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sample_total
             |FROM orders WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'""".stripMargin)),

    // skew path end-to-end: the salted two-phase aggregation must produce
    // EXACTLY the plain groupBy result — summing an exact decimal makes the
    // equality independent of how the salt scattered the partials
    "x11_salted_agg" -> Q(
      (s, d) => Relational.saltedSum(
          T(s, d, "lineitem")
            .select(col("l_returnflag"), col("l_quantity").cast("decimal(18,2)").as("qty")),
          "l_returnflag", salts = 8, sumCols = Seq("qty"))
        .select(col("l_returnflag"), col("n_rows"),
          col("sum_qty").cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(*) AS n_rows,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // write-layout z-order (Morton) key as a pure bit-interleave expression
    // — the 2-D data-skipping sort key (Layout.writeZOrdered); the oracle
    // recomputes the identical interleave bit by bit
    "lo_zorder_key" -> Q(
      (s, d) => TestData.events(s, d)
        .filter(col("event_id") < 2000)
        .select(col("event_id"),
          graft.sources.Layout.zorderKey2(
            pmod(col("user_id"), lit(1024)), pmod(col("event_id"), lit(1024)),
            bitsPerCol = 10).as("zkey"))
        .orderBy(col("event_id")),
      Some {
        val terms = (0 until 10).flatMap(i => Seq(
          s"(((user_id % 1024) >> $i & 1) << ${2 * i})",
          s"(((event_id % 1024) >> $i & 1) << ${2 * i + 1})"))
        s"""SELECT event_id, ${terms.mkString(" | ")} AS zkey
           |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin
      }),

    // multimodal plumbing in the battery: text bytes stand in for media
    // payloads (no codecs in this container), but the pipeline is the real
    // one — binary column → mapPartitions(per-partition codec init) → typed
    // features. The stub's md5 checksum and exact-integer byte-bucket sums
    // are engine-portable, so even the mapPartitions path is hash-checked
    // (documents are ASCII, so DuckDB's per-char ord == the UTF-8 byte).
    "mm_feature_extract" -> Q(
      (s, d) => {
        import graft.multimodal.Multimodal
        val media = T(s, d, "documents").filter(col("doc_id") < 100)
          .select(
            concat(lit("doc-"), col("doc_id").cast("string")).as("media_id"),
            lit("image").as("kind"),
            encode(col("text"), "UTF-8").as("payload"))
        Multimodal.extractFeatures(media, dim = 8).toDF()
          .select(col("media_id"), col("n_bytes"), col("checksum"),
            round(element_at(col("features"), 1).cast("double"), 6).as("f0"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS media_id, text
             |           FROM documents WHERE doc_id < 100),
             |bytes AS (SELECT media_id, ord(substr(text, CAST(p AS INT), 1)) AS b,
             |            CAST(p - 1 AS INT) % 8 AS bucket
             |  FROM (SELECT media_id, text, unnest(range(1, strlen(text) + 1)) AS p FROM m) t),
             |f AS (SELECT media_id, CAST(sum(CASE WHEN bucket = 0 THEN b END) AS DOUBLE) AS s0
             |      FROM bytes GROUP BY media_id)
             |SELECT m.media_id, CAST(strlen(m.text) AS BIGINT) AS n_bytes,
             |  CAST('0x' || substr(md5(m.text), 1, 15) AS BIGINT) AS checksum,
             |  round((COALESCE(f.s0, 0) / 255)::FLOAT::DOUBLE, 6) AS f0
             |FROM m LEFT JOIN f ON m.media_id = f.media_id
             |ORDER BY m.media_id""".stripMargin)),

    // ViT-style patchification of the opaque payload: byte i → patch
    // min(i·grid/len, grid−1), per-patch byte-bucket sums (bucket = byte
    // index mod dim) — exact Long arithmetic end to end, so the oracle
    // replays the mapPartitions codec bit for bit. One row per patch is
    // the batch shape a vision encoder consumes.
    "mm_patch_embed" -> Q(
      (s, d) => {
        import graft.multimodal.Multimodal
        val media = T(s, d, "documents").filter(col("doc_id") < 60)
          .select(
            concat(lit("doc-"), lpad(col("doc_id").cast("string"), 3, "0")).as("media_id"),
            encode(col("text"), "UTF-8").as("payload"))
        Multimodal.patchFeatures(media, grid = 4, dim = 8).toDF()
          .select(col("media_id"), col("patch_idx"), col("n_bytes"),
            element_at(col("features"), 1).as("f0"),
            element_at(col("features"), 6).as("f5"))
          .orderBy(col("media_id"), col("patch_idx"))
      },
      Some("""WITH m AS (SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 3, '0') AS media_id, text
             |           FROM documents WHERE doc_id < 60 AND strlen(text) > 0),
             |bytes AS (SELECT media_id, strlen(text) AS len,
             |            ord(substr(text, CAST(p AS INT), 1)) AS b,
             |            least(((p - 1) * 4) // strlen(text), 3) AS patch_idx,
             |            CAST(p - 1 AS INT) % 8 AS bucket
             |  FROM (SELECT media_id, text, unnest(range(1, strlen(text) + 1)) AS p FROM m) t),
             |grid AS (SELECT media_id, len, g.patch_idx
             |  FROM (SELECT DISTINCT media_id, len FROM bytes) mm,
             |       (SELECT unnest(range(0, 4)) AS patch_idx) g)
             |SELECT grid.media_id, CAST(grid.patch_idx AS INT) AS patch_idx,
             |  CAST(grid.len AS BIGINT) AS n_bytes,
             |  CAST(COALESCE(sum(CASE WHEN bucket = 0 THEN b END), 0) AS BIGINT) AS f0,
             |  CAST(COALESCE(sum(CASE WHEN bucket = 5 THEN b END), 0) AS BIGINT) AS f5
             |FROM grid LEFT JOIN bytes
             |  ON grid.media_id = bytes.media_id AND grid.patch_idx = bytes.patch_idx
             |GROUP BY grid.media_id, grid.patch_idx, grid.len
             |ORDER BY grid.media_id, patch_idx""".stripMargin)),

    // Cross-modal retrieval plumbing: fake-decoded media payloads pooled
    // into 64-dim L2-normalized embeddings (patch sums are exact Longs;
    // one round(·,6)→float quantization at the end, mirrored by the
    // oracle's ::FLOAT::DOUBLE) and cosine-matched against the embeddings
    // corpus — top-3 per media, the retrieve shape of an image→text or
    // text→image search. The media side is tiny and broadcasts; the
    // corpus side is the one real scan.
    "mm_crossmodal_knn" -> Q(
      (s, d) => {
        import graft.multimodal.Multimodal
        val media = T(s, d, "documents").filter(col("doc_id") < 10)
          .select(
            concat(lit("doc-"), lpad(col("doc_id").cast("string"), 3, "0")).as("media_id"),
            encode(col("text"), "UTF-8").as("payload"))
        val mediaEmb = Multimodal.pooledEmbedding(
            Multimodal.patchFeatures(media, grid = 4, dim = 64).toDF(), dim = 64)
          .withColumnRenamed("embedding", "m_emb")
        graft.functions.GraftFunctions.register(s)
        val corpus = TestData.embeddings(s, d).filter(col("vec_id") =!= 0)
        val scored = corpus.crossJoin(broadcast(mediaEmb))
          .select(col("media_id"), col("vec_id"),
            graft.functions.GraftFunctions.cosineSim(
              col("embedding"), col("m_emb")).as("sim"))
          .filter(col("sim").isNotNull)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("media_id")).orderBy(col("sim").desc, col("vec_id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("media_id"), col("rank"), col("vec_id"),
            round(col("sim"), 6).as("sim"))
          .orderBy(col("media_id"), col("rank"))
      },
      Some("""WITH m AS (SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 3, '0') AS media_id, text
             |           FROM documents WHERE doc_id < 10 AND strlen(text) > 0),
             |bytes AS (SELECT media_id,
             |            ord(substr(text, CAST(p AS INT), 1)) AS b,
             |            CAST(p - 1 AS INT) % 64 AS bucket
             |  FROM (SELECT media_id, text, unnest(range(1, strlen(text) + 1)) AS p FROM m) t),
             |mgrid AS (SELECT mm.media_id, g.j
             |  FROM (SELECT DISTINCT media_id FROM bytes) mm
             |  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) g),
             |dims AS (SELECT mgrid.media_id, mgrid.j,
             |    CAST(COALESCE(sum(bytes.b), 0) AS DOUBLE) AS s
             |  FROM mgrid LEFT JOIN bytes
             |    ON bytes.media_id = mgrid.media_id AND bytes.bucket = mgrid.j
             |  GROUP BY mgrid.media_id, mgrid.j),
             |norms AS (SELECT media_id, SQRT(SUM(s * s)) AS nrm FROM dims GROUP BY media_id),
             |memb AS (SELECT d.media_id, d.j,
             |    round(d.s / n.nrm, 6)::FLOAT::DOUBLE AS x
             |  FROM dims d JOIN norms n USING (media_id) WHERE n.nrm > 0),
             |corp AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
             |           unnest(embedding)::DOUBLE AS y
             |         FROM embeddings WHERE vec_id <> 0),
             |scores AS (SELECT m.media_id, c.vec_id,
             |    SUM(m.x * c.y) / (SQRT(SUM(m.x * m.x)) * SQRT(SUM(c.y * c.y))) AS sim
             |  FROM memb m JOIN corp c ON m.j = c.j
             |  GROUP BY m.media_id, c.vec_id),
             |ranked AS (SELECT media_id, vec_id, sim, row_number() OVER (
             |    PARTITION BY media_id ORDER BY sim DESC, vec_id) AS rank
             |  FROM scores)
             |SELECT media_id, CAST(rank AS INT) AS rank, vec_id, round(sim, 6) AS sim
             |FROM ranked WHERE rank <= 3
             |ORDER BY media_id, rank""".stripMargin)),

    // array / higher-order-function surface over the embedding column:
    // element access, slicing, per-element transforms, reductions — the
    // Spark functions Catalyst codegens vs DuckDB's list_* twins
    "f18_array_ops" -> Q(
      (s, d) => TestData.embeddings(s, d)
        .filter(col("vec_id").between(1, 100) && col("embedding").isNotNull)
        .select(col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("first_el"),
          round(aggregate(slice(col("embedding"), 1, 4), lit(0.0d),
            (a, x) => a + x.cast("double")), 6).as("head4_sum"),
          size(filter(col("embedding"), x => x > 0.0f)).as("n_positive"),
          round(array_max(transform(col("embedding"), x => abs(x.cast("double")))), 6)
            .as("max_abs"))
        .orderBy(col("vec_id")),
      Some("""SELECT vec_id,
             |  CAST(len(embedding) AS INT) AS dim,
             |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_el,
             |  round(list_sum(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))), 6) AS head4_sum,
             |  CAST(len(list_filter(embedding, x -> x > 0.0)) AS INT) AS n_positive,
             |  round(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 6) AS max_abs
             |FROM embeddings
             |WHERE vec_id BETWEEN 1 AND 100 AND embedding IS NOT NULL
             |ORDER BY vec_id""".stripMargin)),

    // datetime surface: truncation, parts, arithmetic, epoch round trips —
    // F8's now()/ISO formatting generalized to the full temporal toolkit
    "f17_datetime" -> Q(
      (s, d) => TestData.events(s, d)
        .filter(col("event_id") < 500)
        .select(col("event_id"),
          unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
          dayofweek(col("ts")).as("dow"),
          month(col("ts")).as("mon"),
          year(col("ts")).as("yr"),
          unix_millis(col("ts") + expr("INTERVAL 90 MINUTE")).as("plus90_ms"),
          date_format(col("ts"), "yyyy-MM-dd").as("day_str"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_ms,
             |  CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS INT) AS dow,
             |  CAST(month(CAST(ts AS TIMESTAMP)) AS INT) AS mon,
             |  CAST(year(CAST(ts AS TIMESTAMP)) AS INT) AS yr,
             |  epoch_ms(CAST(ts AS TIMESTAMP) + INTERVAL 90 MINUTE) AS plus90_ms,
             |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day_str
             |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin)),

    // remaining ANSI set ops (EXCEPT ALL / INTERSECT ALL duplicates kept)
    "u3_except_all" -> Q(
      (s, d) => {
        val big = TestData.events(s, d).filter(col("value") >= 50.0).select(col("user_id"))
        val purch = TestData.events(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"))
        big.exceptAll(purch).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n FROM (
             |  SELECT user_id FROM events WHERE value >= 50.0
             |  EXCEPT ALL
             |  SELECT user_id FROM events WHERE event_type = 'purchase') t
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // data-quality: single-pass column profile (count/null/distinct/min/max)
    "dq_profile" -> Q(
      (s, d) => graft.quality.DataQuality.profile(
          T(s, d, "lineitem"), Seq("l_quantity", "l_discount", "l_returnflag"))
        .orderBy(col("column")),
      Some("""SELECT * FROM (
             |  SELECT 'l_quantity' AS "column", count(l_quantity) AS n_nonnull,
             |    count(*) FILTER (WHERE l_quantity IS NULL) AS n_null,
             |    count(DISTINCT l_quantity) AS n_distinct,
             |    CAST(min(l_quantity) AS VARCHAR) AS min_val, CAST(max(l_quantity) AS VARCHAR) AS max_val
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_discount', count(l_discount),
             |    count(*) FILTER (WHERE l_discount IS NULL),
             |    count(DISTINCT l_discount),
             |    CAST(min(l_discount) AS VARCHAR), CAST(max(l_discount) AS VARCHAR)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_returnflag', count(l_returnflag),
             |    count(*) FILTER (WHERE l_returnflag IS NULL),
             |    count(DISTINCT l_returnflag),
             |    CAST(min(l_returnflag) AS VARCHAR), CAST(max(l_returnflag) AS VARCHAR)
             |  FROM lineitem) t ORDER BY "column" """.stripMargin)),

    // data-quality: expectation violations in one conditional-agg pass
    // (NULL predicate counts as a violation, mirrored by the coalesce)
    "dq_expectations" -> Q(
      (s, d) => graft.quality.DataQuality.violations(T(s, d, "lineitem"), Seq(
          graft.quality.DataQuality.Rule("discount_range", col("l_discount").between(0.0, 0.1)),
          graft.quality.DataQuality.Rule("quantity_range", col("l_quantity").between(1, 50)),
          graft.quality.DataQuality.Rule("shipdate_present", col("l_shipdate").isNotNull)))
        .orderBy(col("rule")),
      Some("""SELECT * FROM (
             |  SELECT 'discount_range' AS rule,
             |    count(*) FILTER (WHERE NOT coalesce(l_discount BETWEEN 0.0 AND 0.1, false)) AS n_violations
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'quantity_range',
             |    count(*) FILTER (WHERE NOT coalesce(l_quantity BETWEEN 1 AND 50, false))
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'shipdate_present',
             |    count(*) FILTER (WHERE l_shipdate IS NULL)
             |  FROM lineitem) t ORDER BY rule""".stripMargin)),

    // robust outliers: modified z-score 0.6745*(x-med)/MAD per event_type,
    // z rounded before thresholding so the flag is boundary-stable
    "dq_outliers" -> Q(
      (s, d) => graft.quality.DataQuality.robustOutliers(
          TestData.events(s, d), "event_type", "value", threshold = 3.5)
        .select(col("event_id"), col("event_type"), col("value"),
          col("robust_z"), col("is_outlier"), col("grp_median"), col("grp_mad")),
      Some("""WITH med AS (
             |  SELECT event_type, median(value) AS m FROM events GROUP BY 1),
             |mad AS (
             |  SELECT e.event_type, median(abs(e.value - med.m)) AS d
             |  FROM events e JOIN med USING (event_type) GROUP BY 1),
             |r AS (
             |  SELECT e.event_id, e.event_type, e.value,
             |    CASE WHEN mad.d <> 0
             |         THEN round(0.6745 * (e.value - med.m) / mad.d, 6) END AS robust_z,
             |    round(med.m, 6) AS grp_median, round(mad.d, 6) AS grp_mad
             |  FROM events e JOIN med USING (event_type) JOIN mad USING (event_type))
             |SELECT event_id, event_type, value, robust_z,
             |  coalesce(abs(robust_z) > 3.5, false) AS is_outlier,
             |  grp_median, grp_mad
             |FROM r""".stripMargin)),

    // stratified sampling, engine-portable: per-stratum keep-fractions
    // applied via an md5-prefix threshold — the same rows survive in any
    // engine, no RNG state, no coordination; the rebalancing op of a
    // training-data pipeline (downsample dominant classes)
    "x6_stratified_sample" -> Q(
      (s, d) => {
        val frac = when(col("event_type") === "view", lit(4096))      // 1/16
          .when(col("event_type") === "click", lit(16384))            // 1/4
          .otherwise(lit(65536))                                      // keep all
        TestData.events(s, d)
          .filter(conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10)
            .cast("long") < frac)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_kept"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n_kept
             |FROM events
             |WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4)) AS INTEGER) <
             |  CASE event_type WHEN 'view' THEN 4096 WHEN 'click' THEN 16384 ELSE 65536 END
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // mergeable HLL sketches (Apache DataSketches): per-DAY sketches union
    // into the per-type rollup WITHOUT rescanning — the incremental-cube
    // pattern. The sketch binary is engine-specific, so the oracle checks
    // the SEMANTIC claim instead: the merged estimate lands within 5% of
    // the exact distinct count (a boolean DuckDB verifies exactly);
    // bit-level merge exactness stays pinned in RelationalSpec
    "a12_hll_mergeable" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        .groupBy(col("event_type"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
          count(lit(1)).as("n_daily_sketches"))
        .join(TestData.events(s, d).groupBy(col("event_type"))
            .agg(countDistinct(col("user_id")).as("exact_users")),
          Seq("event_type"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("est") - col("exact_users")) <=
            col("exact_users") * 0.05).as("within_5pct"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |  TRUE AS within_5pct
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // HLL sketch (approx_count_distinct): estimator internals are
    // engine-specific, so the oracle checks the bounded-relative-error
    // claim (|approx − exact| ≤ 5% · exact) as an exact boolean — the
    // estimate itself never crosses engines. rsd = 0.01 so the pinned 5%
    // bound sits at ~5σ of the sketch's deterministic error: the default
    // 0.05 makes 5% a ONE-sigma event, and at sf0.1 (1500 distinct per
    // group) the estimate landed outside it — caught by the round-10
    // both-SF oracle sweep.
    "a10_approx_distinct" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx") - col("exact_users")) <=
            col("exact_users") * 0.05).as("within_5pct"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |  TRUE AS within_5pct
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))
  )

  /** Exact disc-price: decimal(18,2) × decimal(3,2) stays exact; double out. */
  private def discPrice: Column =
    sum(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(java.math.BigDecimal.ONE).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
      .cast("double")

  private def storeDefs: Seq[(String, Q)] = Seq(

    // S4 — append-with-sequence semantics over the Message∪Result union:
    // batch row_number assignment + id synthesis (neo4j_memory.py:306-431)
    "s4_append_sequence" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d)
        val items = ev.filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), col("event_id"), lit("msg").as("kind"))
          .unionByName(ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("event_id"), lit("result").as("kind")))
        Relational.sequenceAndNext(items, "user_id", "event_id", Seq(col("event_id")))
          .select(col("user_id"), col("event_id"),
            concat(lit("wf-"), col("user_id").cast("string"),
              when(col("kind") === "msg", lit("-msg-")).otherwise(lit("-result-")),
              col("sequence").cast("string")).as("node_id"),
            col("sequence"), col("next_id"))
          .orderBy(col("user_id"), col("sequence"))
      },
      Some("""WITH items AS (
             |  SELECT user_id, event_id, 'msg' AS kind FROM events WHERE event_type IN ('click','view')
             |  UNION ALL
             |  SELECT user_id, event_id, 'result' AS kind FROM events WHERE event_type = 'purchase'),
             |seq AS (SELECT user_id, event_id, kind,
             |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INT) AS sequence,
             |    lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS next_id
             |  FROM items)
             |SELECT user_id, event_id,
             |  'wf-' || user_id || (CASE WHEN kind = 'msg' THEN '-msg-' ELSE '-result-' END) || sequence AS node_id,
             |  sequence, next_id
             |FROM seq ORDER BY user_id, sequence""".stripMargin)),

    // S6 — idempotent re-link: candidates minus already-linked (anti-join).
    // "Linked" = holds a high-value purchase (value > 90): every fixture
    // user has SOME purchase, so the unqualified guard returned 0 rows and
    // proved nothing — this fixture leaves real unlinked users at every SF
    "s6_relink_guard" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d)
        val existing = ev
          .filter(col("event_type") === "purchase" && col("value") > 90.0)
          .select(col("user_id")).distinct()
        val candidates = ev.select(col("user_id")).distinct()
        candidates.join(existing, Seq("user_id"), "left_anti")
          .select(col("user_id"), lit("r-shared").as("result_id"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, 'r-shared' AS result_id
             |FROM (SELECT DISTINCT user_id FROM events) c
             |WHERE NOT EXISTS (SELECT 1 FROM events e
             |                  WHERE e.event_type = 'purchase' AND e.value > 90
             |                    AND e.user_id = c.user_id)
             |ORDER BY user_id""".stripMargin)),

    // Snapshots CDC end-to-end: two versioned writes (deterministic slices
    // of orders) → Snapshots.diff classifies insert/delete/update — the
    // Iceberg changelog verb over the versioned-parquet store, pinned
    // against an oracle that recomputes the classification relationally
    "snap_diff_cdc" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapdiff")
        val base = root.toString + "/t"
        val orders = T(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
        Snapshots.write(orders.filter(pmod(col("o_orderkey"), lit(10)) =!= 0), base)
        Snapshots.write(
          orders.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
            .withColumn("o_totalprice", col("o_totalprice") +
              when(pmod(col("o_orderkey"), lit(3)) === 0, 1.0).otherwise(0.0)),
          base)
        Snapshots.diff(s, base, 1L, 2L, "o_orderkey")
          .groupBy(col("change_type")).agg(count(lit(1)).as("n"))
          .orderBy(col("change_type"))
      },
      Some("""WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 <> 0),
             |v2 AS (SELECT o_orderkey,
             |         o_totalprice + CASE WHEN o_orderkey % 3 = 0 THEN 1.0 ELSE 0.0 END AS o_totalprice
             |       FROM orders WHERE o_orderkey % 7 <> 0),
             |d AS (SELECT CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
             |             WHEN v2.o_orderkey IS NULL THEN 'delete'
             |             WHEN v1.o_totalprice <> v2.o_totalprice THEN 'update' END AS change_type
             |      FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey)
             |SELECT change_type, count(*) AS n FROM d
             |WHERE change_type IS NOT NULL GROUP BY change_type ORDER BY change_type""".stripMargin)),

    // Incremental materialized-aggregate maintenance: CDC delta applied to
    // a v1 rollup must equal recomputing from v2 (the oracle computes the
    // direct v2 aggregate; the Spark side takes the incremental path —
    // decimal sums make the two bit-identical)
    "snap_incremental_agg" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("incragg")
        val base = root.toString + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            pmod(col("o_custkey"), lit(100)).as("cohort"))
        Snapshots.write(orders.filter(pmod(col("o_orderkey"), lit(10)) =!= 0), base)
        Snapshots.write(
          orders.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
            .withColumn("o_totalprice", col("o_totalprice") +
              when(pmod(col("o_orderkey"), lit(3)) === 0, 1.0).otherwise(0.0)),
          base)
        val matAgg = Snapshots.read(s, base, Some(1L))
          .groupBy(col("cohort"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
        val delta = Snapshots.incrementalAggDelta(s, base, 1L, 2L,
          "o_orderkey", Seq("cohort"), "o_totalprice")
        Snapshots.applyAggDelta(matAgg, delta, Seq("cohort"))
          .select(col("cohort"), col("n"),
            round(col("total").cast("double"), 2).as("total"))
          .orderBy(col("cohort"))
      },
      Some("""SELECT o_custkey % 100 AS cohort, count(*) AS n,
             |  round(CAST(sum(CAST(o_totalprice +
             |    CASE WHEN o_orderkey % 3 = 0 THEN 1.0 ELSE 0.0 END
             |    AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
             |FROM orders WHERE o_orderkey % 7 <> 0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Incremental snapshot APPEND: v2 inherits every v1 file by manifest
    // reference and writes only the delta (write cost ∝ delta — the
    // Iceberg manifest-sharing property, file-level pins in SnapshotsSpec).
    // The oracle recomputes v2's content relationally; files_shared proves
    // the inheritance actually happened, not a silent full rewrite.
    "snap_append_share" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapappend")
        val base = root.toString + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val v1 = Snapshots.write(
          orders.filter(pmod(col("o_orderkey"), lit(10)) < 8), base)
        val v2 = Snapshots.append(
          orders.filter(pmod(col("o_orderkey"), lit(10)) >= 8), base)
        val m1 = Snapshots.manifestFiles(s, base, v1)
        val m2 = Snapshots.manifestFiles(s, base, v2)
        val shared = m1.nonEmpty && m1.forall(m2.contains)
        Snapshots.read(s, base, Some(v2))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("files_shared", lit(shared))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  TRUE AS files_shared
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // COW DELETE + compaction end-to-end: multi-file v1 → deleteWhere
    // rewrites only files containing matches (clean files inherited) →
    // compact bin-packs the rewritten smalls back together. The oracle
    // recomputes the surviving content relationally; the two booleans
    // prove file-level inheritance and file-count reduction actually
    // happened rather than silent full rewrites.
    "snap_delete_compact" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapdel")
        val base = root.toString + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        // range-partitioned layout: a key-range delete touches only the
        // low-range file(s), so COW inheritance is actually exercised
        Snapshots.write(orders.repartitionByRange(8, col("o_orderkey")), base)
        val m1 = Snapshots.manifestFiles(s, base, 1L)
        val v2 = Snapshots.deleteWhere(s, base, col("o_orderkey") < 100)
        val m2 = Snapshots.manifestFiles(s, base, v2)
        val sharedAfterDelete = m1.exists(m2.contains)
        val v3 = Snapshots.compact(s, base, smallBytes = 64L * 1024 * 1024,
          targetBytes = 64L * 1024 * 1024)
        val compactedFewer = Snapshots.manifestFiles(s, base, v3).size <= m2.size
        Snapshots.read(s, base)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("delete_shared_files", lit(sharedAfterDelete))
          .withColumn("compacted_fewer_files", lit(compactedFewer))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  TRUE AS delete_shared_files, TRUE AS compacted_fewer_files
             |FROM orders WHERE o_orderkey >= 100
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // WAP with the QUALITY GATE as the audit — the publish-time contract
    // of a versioned corpus: a batch only becomes a version if enough of
    // it survives the composite gate. A degenerate batch (single repeated
    // token per doc — fails low_diversity) is rejected at the audit and
    // never becomes a version; the good batch lands. One implementation of
    // the gate serves batch query, streaming counters, dataprep pipeline,
    // and now the publish audit. Oracle recomputes the surviving content's
    // gate stats relationally.
    "pipeline_wap_gate" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("wapgate")
        val base = root + "/t"
        val good = T(s, d, "documents").filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text"))
        // audit: at least 10% of the batch must pass the composite gate
        def gateAudit(batch: DataFrame): Boolean = {
          val r = TextAnalysis.qualityGate(batch, "text")
            .agg(count(lit(1)).as("n"),
              sum(when(col("keep"), 1L).otherwise(0L)).as("k"))
            .head()
          r.getLong(0) > 0 && r.getLong(1).toDouble / r.getLong(0) >= 0.10
        }
        Snapshots.writeAudited(good, base, gateAudit)
        // degenerate batch: every doc is one token repeated 40× —
        // fails the diversity rule, keep-rate 0 → audit rejects
        val garbage = good.limit(50)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat_ws(" ", array_repeat(lit("lorem"), 40)).as("text"))
        val rejected = try {
          Snapshots.writeAudited(garbage, base, gateAudit, append = true)
          false
        } catch { case _: Snapshots.AuditFailedException => true }
        TextAnalysis.qualityGate(Snapshots.read(s, base), "text")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
          .withColumn("garbage_rejected", lit(rejected))
          .withColumn("n_versions", lit(Snapshots.versions(s, base).size))
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS toks,
             |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> length(x) > 0) AS ltoks
             |  FROM documents WHERE doc_id < 100),
             |m AS (
             |  SELECT doc_id, len(toks) AS n,
             |    CASE WHEN len(toks) > 0
             |         THEN len(list_distinct(toks)) * 1.0 / len(toks) END AS ttr,
             |    CASE WHEN len(toks) > 0
             |         THEN list_sum(list_transform(toks, x -> length(x))) * 1.0
             |              / len(toks) END AS awl,
             |    CASE WHEN len(ltoks) > 0
             |         THEN len(list_filter(ltoks,
             |                x -> x IN ('the', 'a', 'of', 'and'))) * 1.0
             |              / len(ltoks) END AS sw
             |  FROM t)
             |SELECT count(*) AS n_docs,
             |  CAST(sum(CASE WHEN (n BETWEEN 20 AND 90) AND (awl BETWEEN 3.8 AND 5.2)
             |            AND ttr >= 0.45 AND sw >= 0.02 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  TRUE AS garbage_rejected, 1 AS n_versions
             |FROM m""".stripMargin)),

    // Write-audit-publish + rollback — the two recovery verbs of a
    // versioned store: a corrupted batch is REJECTED at the audit stage
    // (never becomes a version), a fat-finger replace that does land is
    // undone by a metadata-only rollback, and the bad version stays
    // time-travelable for the post-mortem. Oracle recomputes the surviving
    // content; wap_rejected/n_versions pin that the audit blocked one
    // commit and rollback added one.
    "snap_rollback_wap" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snaprbwap")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Snapshots.write(orders.filter(pmod(col("o_orderkey"), lit(10)) =!= 0), base)
        val wapRejected = try {
          Snapshots.writeAudited(
            orders.withColumn("o_totalprice", -col("o_totalprice")),
            base, a => a.filter(col("o_totalprice") < 0).count() == 0)
          false
        } catch { case _: Snapshots.AuditFailedException => true }
        Snapshots.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 0), base)
        val v3 = Snapshots.rollback(s, base, 1L)
        Snapshots.read(s, base, Some(v3))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("wap_rejected", lit(wapRejected))
          .withColumn("n_versions", lit(Snapshots.versions(s, base).size))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  TRUE AS wap_rejected, 3 AS n_versions
             |FROM orders WHERE o_orderkey % 10 <> 0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Branch → audit → fast-forward publish (round-11): the Iceberg
    // branching workflow end-to-end — fork a branch (metadata-only),
    // commit experimental data to it while main stays undisturbed, audit
    // the branch content, publish by fast-forwarding main to the branch
    // head (again metadata-only), then drop the branch; the published
    // files must survive the drop. Oracle recomputes the published
    // content plus literal pins on the chain lengths at each step.
    "snap_branch_publish" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapbranch")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Snapshots.write(orders.filter(col("o_orderstatus") === "O"), base)
        Snapshots.createBranch(s, base, "staging", fromVersion = 1L)
        Snapshots.appendBranch(orders.filter(col("o_orderstatus") === "F"),
          base, "staging")
        val mainUndisturbed = Snapshots.versions(s, base).size
        // audit the branch before publishing (the WAP gate, on a branch)
        val auditOk = Snapshots.readBranch(s, base, "staging")
          .filter(col("o_totalprice") < 0).isEmpty
        Snapshots.fastForward(s, base, "staging")
        Snapshots.dropBranch(s, base, "staging")
        Snapshots.read(s, base)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("audit_ok", lit(auditOk))
          .withColumn("n_main_during_branch", lit(mainUndisturbed))
          .withColumn("n_main_after_publish", lit(Snapshots.versions(s, base).size))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  TRUE AS audit_ok, 1 AS n_main_during_branch,
             |  2 AS n_main_after_publish
             |FROM orders WHERE o_orderstatus IN ('O', 'F')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Streaming branch-WAP (round-12): the CONTINUOUS version of the
    // branch-publish workflow — micro-batch-shaped idempotent commits
    // land on a staging branch under a write-audit, only audit-passed
    // batches fast-forward to main (metadata-only), a rejected batch
    // leaves a marker-only branch version (stream liveness without
    // publishing), and a full crash-replay of a committed batch is a
    // no-op on every chain. Oracle recomputes the published content
    // (both clean thirds of orders) plus literal pins on the
    // reject/replay outcomes and the main chain length.
    "snap_stream_wap" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapstreamwap")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val audit: DataFrame => Boolean =
          b => b.filter(col("o_totalprice") < 0).isEmpty
        Snapshots.write(orders.limit(0), base) // v1: schema pin (bootstrap)
        Snapshots.createBranch(s, base, "staging", fromVersion = 1L)
        // batch 0: clean slice — branch commit + publish
        Snapshots.appendStreamBranch(
          orders.filter(pmod(col("o_orderkey"), lit(3)) === 0),
          base, "staging", "wapstream", 0L, audit = Some(audit))
        Snapshots.fastForwardStream(s, base, "staging", "wapstream", 0L)
        // batch 1: corrupted (negative totals) — audit rejects: marker-only
        // branch version, nothing published
        val (_, ok1) = Snapshots.appendStreamBranch(
          orders.filter(pmod(col("o_orderkey"), lit(3)) === 1)
            .withColumn("o_totalprice", -col("o_totalprice")),
          base, "staging", "wapstream", 1L, audit = Some(audit))
        // batch 2: clean slice, committed and published …
        val b2 = orders.filter(pmod(col("o_orderkey"), lit(3)) === 2)
        Snapshots.appendStreamBranch(b2, base, "staging", "wapstream", 2L,
          audit = Some(audit))
        Snapshots.fastForwardStream(s, base, "staging", "wapstream", 2L)
        // … then fully REPLAYED (the crash-restart path): triple no-op
        val nMain = Snapshots.versions(s, base).size
        Snapshots.appendStreamBranch(b2, base, "staging", "wapstream", 2L,
          audit = Some(audit))
        Snapshots.fastForwardStream(s, base, "staging", "wapstream", 2L)
        val replayNoop = Snapshots.versions(s, base).size == nMain
        Snapshots.read(s, base)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("batch1_rejected", lit(!ok1))
          .withColumn("replay_noop", lit(replayNoop))
          .withColumn("n_main_versions", lit(nMain))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  TRUE AS batch1_rejected, TRUE AS replay_noop,
             |  3 AS n_main_versions
             |FROM orders WHERE o_orderkey % 3 <> 1
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Tag retention (round-11): Iceberg named refs — a tag pins its
    // snapshot against BOTH expiry paths, read-by-name time travel works
    // after aggressive expiry, and dropping the tag releases the pin. The
    // oracle recomputes the tagged snapshot's content (which only survives
    // the keep=1 expiry BECAUSE of the tag) plus literal pins on the
    // retention counts before/after the drop.
    "snap_tag_retention" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snaptag")
        val base = root + "/t"
        val cust = T(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        Snapshots.write(cust.filter(pmod(col("c_custkey"), lit(3)) === 0), base)
        Snapshots.append(cust.filter(pmod(col("c_custkey"), lit(3)) === 1), base)
        Snapshots.append(cust.filter(pmod(col("c_custkey"), lit(3)) === 2), base)
        Snapshots.tag(s, base, "baseline", 1L)
        // keep=1 would normally leave only v3 — the tag must pin v1
        Snapshots.expire(s, base, keep = 1)
        val afterExpire = Snapshots.versions(s, base)
        // materialize the tagged read BEFORE releasing the pin — the
        // second expire below deletes v1's files, and a lazy plan would
        // read a deleted snapshot (exactly the mistake tags exist to stop)
        val tagged = Snapshots.readTag(s, base, "baseline")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total"))
          .localCheckpoint()
        // releasing the pin makes the snapshot expirable again
        Snapshots.dropTag(s, base, "baseline")
        Snapshots.expire(s, base, keep = 1)
        tagged
          .withColumn("n_versions_pinned", lit(afterExpire.size))
          .withColumn("n_versions_released", lit(Snapshots.versions(s, base).size))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  2 AS n_versions_pinned, 1 AS n_versions_released
             |FROM customer WHERE c_custkey % 3 = 0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Crash recovery end-to-end (round-8 verdict stretch item): the three
    // crash-safety paths — stale-marker txn vacuum, debris aside-rename at
    // slot claim, husk collection — exercised as ONE query with an oracle
    // row, not just unit pins. A writer dies mid-stage (stale .txn-*), a
    // second dies pre-protocol squatting the next version slot (manifest-
    // less v=2); vacuum collects the first, the recommit claims the slot by
    // moving the squatter aside atomically, and a second vacuum collects
    // the husk. The oracle recomputes the final content (crash debris must
    // never surface in ANY read) plus literal pins on the recovery counts.
    "snap_crash_recover" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapcrash")
        val base = root + "/t"
        val cust = T(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        Snapshots.write(cust.filter(pmod(col("c_custkey"), lit(2)) === 0), base)
        // crashed writer #1: died mid-stage — a .txn-* dir whose marker
        // clock AND mtimes are 2 h stale (past the 1 h ttl)
        val old = System.currentTimeMillis() - 2L * 60 * 60 * 1000
        val deadTxn = new java.io.File(s"$base/.txn-deadwriter0000")
        deadTxn.mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(deadTxn.getPath, "part-00000-dead.parquet"),
          Array[Byte](1, 2, 3))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(deadTxn.getPath, "_inflight"),
          old.toString.getBytes("UTF-8"))
        deadTxn.listFiles().foreach(_.setLastModified(old))
        deadTxn.setLastModified(old)
        val vac1 = Snapshots.vacuum(s, base)
        // crashed writer #2: pre-protocol debris SQUATTING the next slot —
        // a manifest-less v=2 left after vacuum ran (worst-case ordering)
        val squatter = new java.io.File(s"$base/v=2")
        squatter.mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(squatter.getPath, "part-00000-crash.parquet"),
          Array[Byte](9, 9, 9))
        // recommit: the slot claim must move the squatter aside (atomic
        // rename, never delete-in-place) and land v=2 all-or-nothing
        val v2 = Snapshots.append(
          cust.filter(pmod(col("c_custkey"), lit(2)) === 1), base)
        val vac2 = Snapshots.vacuum(s, base)
        Snapshots.read(s, base, Some(v2))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total"))
          .withColumn("recovered_versions",
            lit(Snapshots.versions(s, base) == Seq(1L, 2L)))
          .withColumn("n_vacuumed_txn", lit(vac1.count(_.contains(".txn-"))))
          .withColumn("n_vacuumed_husk", lit(vac2.count(_.contains(".debris-"))))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  TRUE AS recovered_versions, 1 AS n_vacuumed_txn,
             |  1 AS n_vacuumed_husk
             |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Incremental ingest dedup — the composition a production corpus runs
    // on every batch: MERGE the delta into the versioned store, let CDC
    // name exactly the inserted docs, then LSH-check ONLY those against
    // the prior corpus (broadcast delta buckets into the band-partitioned
    // corpus — the corpus is never self-joined, so the check costs
    // O(delta), not O(corpus²)). Output is the admission verdict per
    // inserted doc. The oracle recomputes the identical md5 minhash/LSH
    // relationally; the delta set (CDC inserts) is the deterministic
    // %10 slice, so snapshot plumbing cancels out of the oracle.
    "pipeline_incremental_dedup" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("incdedup")
        val base = root + "/t"
        val docs = T(s, d, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), col("text"))
        Snapshots.write(docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
          base, statsKey = Some("doc_id"))
        val v2 = Snapshots.mergeInto(s, base,
          docs.filter(pmod(col("doc_id"), lit(10)) === 0), "doc_id")
        val inserted = Snapshots.diff(s, base, 1L, v2, "doc_id")
          .filter(col("change_type") === "insert").select(col("doc_id"))
        val delta = Snapshots.read(s, base, Some(v2))
          .join(inserted, Seq("doc_id"), "left_semi")
        val corpus = Snapshots.read(s, base, Some(1L))
        val matches = Dedup.incrementalLshMatches(
          Dedup.minhashSignature(delta, "doc_id", "text", 5, 4),
          Dedup.minhashSignature(corpus, "doc_id", "text", 5, 4),
          "doc_id", numHashes = 4, bands = 2)
        delta.select(col("doc_id"))
          .join(matches.groupBy(col("id_new").as("doc_id"))
            .agg(countDistinct(col("id_corpus")).as("n_dups")), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_dups"), lit(0L)).as("n_dup_matches"),
            (coalesce(col("n_dups"), lit(0L)) === 0).as("admitted"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${shingleCte("WHERE doc_id < 200")},
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig),
             |nb AS (SELECT doc_id AS id_new, band, bucket FROM b WHERE doc_id % 10 = 0),
             |cb AS (SELECT doc_id AS id_corpus, band, bucket FROM b WHERE doc_id % 10 <> 0),
             |m AS (SELECT DISTINCT id_new, id_corpus FROM nb JOIN cb USING (band, bucket)),
             |agg AS (SELECT id_new, count(DISTINCT id_corpus) AS n FROM m GROUP BY id_new)
             |SELECT d.doc_id, coalesce(a.n, 0) AS n_dup_matches,
             |  coalesce(a.n, 0) = 0 AS admitted
             |FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 200 AND doc_id % 10 = 0) d
             |LEFT JOIN agg a ON a.id_new = d.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Z-order compaction end-to-end: a randomly-laid-out multi-file
    // snapshot is bin-packed WITH Morton clustering on two bounded derived
    // dims; the zorder_tiled flag proves a range predicate on one dim now
    // overlaps at most half the files (it overlapped all of them before) —
    // the data-skipping win a 100 TB scan cashes in via parquet min/max.
    // Content must be bit-identical: the oracle recomputes it from orders.
    "snap_zorder_compact" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapzorder")
        val base = root + "/t"
        val orders = T(s, d, "orders").select(
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          pmod(col("o_orderkey"), lit(1024)).cast("int").as("zx"),
          pmod(col("o_custkey"), lit(1024)).cast("int").as("zy"))
        Snapshots.write(orders.repartition(8), base)
        val f1 = Snapshots.manifestFiles(s, base, 1L)
        val sizes = f1.map(p => new java.io.File(s"$base/$p").length())
        // ~16 tiles fix the top FOUR z bits (two per dim), so zx <= 127
        // (zx's top three bits zero) lives in ≤ a quarter of the tiles
        // plus boundary straddlers — comfortably under half
        val v2 = Snapshots.compact(s, base, smallBytes = Long.MaxValue,
          targetBytes = math.max(1L, sizes.sum / 16),
          zorderBy = Some(("zx", "zy")), zBits = 10)
        val files = Snapshots.manifestFiles(s, base, v2).map(p => s"$base/$p")
        val st = s.read.parquet(files: _*)
          .groupBy(input_file_name())
          .agg(min(col("zx")).as("mn"), max(col("zx")).as("mx"))
          .collect()
        // zx <= 127 pins the top three zx bits to zero: at most half the
        // z-range tiles can contain such rows
        val tiled = st.length >= 4 && st.count(_.getInt(1) <= 127) * 2 <= st.length
        Snapshots.read(s, base, Some(v2))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("zorder_tiled", lit(tiled))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  TRUE AS zorder_tiled
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Write-side schema evolution through the snapshot DML: v1 has two
    // columns; a MERGE source carries a NEW column (o_orderpriority). Old
    // files inherit untouched, the rewrite+insert file carries the column,
    // read() null-fills inherited rows, and CDC classifies the merged rows
    // — write → evolve → read → diff as ONE plan. Oracle recomputes the
    // merge and the classification relationally.
    "snap_schema_evolve" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapevolve")
        val base = root + "/t"
        val orders = T(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
        Snapshots.write(orders.filter(pmod(col("o_orderkey"), lit(10)) =!= 0),
          base, statsKey = Some("o_orderkey"))
        val src = T(s, d, "orders")
          .filter(pmod(col("o_orderkey"), lit(13)) === 0)
          .select(col("o_orderkey"), (col("o_totalprice") + 1.0).as("o_totalprice"),
            col("o_orderpriority"))
        val v2 = Snapshots.mergeInto(s, base, src, "o_orderkey")
        val latest = Snapshots.read(s, base, Some(v2))
        val cdc = Snapshots.diff(s, base, 1L, v2, "o_orderkey")
        latest.join(cdc, Seq("o_orderkey"), "left")
          .groupBy(
            coalesce(col("o_orderpriority"), lit("NONE")).as("o_orderpriority"),
            coalesce(col("change_type"), lit("unchanged")).as("change_type"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderpriority"), col("change_type"))
      },
      Some("""WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 <> 0),
             |src AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, o_orderpriority
             |        FROM orders WHERE o_orderkey % 13 = 0),
             |latest AS (
             |  SELECT v1.o_orderkey, v1.o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
             |  FROM v1 WHERE v1.o_orderkey NOT IN (SELECT o_orderkey FROM src)
             |  UNION ALL
             |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM src),
             |cdc AS (
             |  SELECT s.o_orderkey,
             |    CASE WHEN v1.o_orderkey IS NULL THEN 'insert' ELSE 'update' END AS change_type
             |  FROM src s LEFT JOIN v1 ON v1.o_orderkey = s.o_orderkey)
             |SELECT COALESCE(l.o_orderpriority, 'NONE') AS o_orderpriority,
             |  COALESCE(c.change_type, 'unchanged') AS change_type,
             |  count(*) AS n,
             |  CAST(sum(CAST(l.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM latest l LEFT JOIN cdc c ON l.o_orderkey = c.o_orderkey
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // S7 — embedding column point-update semantics (SET r.embedding WHERE id)
    "s7_embedding_update" -> Q(
      (s, d) => {
        val q = queryVec(s, d)
        T(s, d, "embeddings")
          .withColumn("embedding",
            when(col("vec_id").isin(1L, 2L, 3L), lit(q).cast("array<float>"))
              .otherwise(col("embedding")))
          .select(col("vec_id"),
            col("vec_id").isin(1L, 2L, 3L).as("was_updated"),
            size(col("embedding")).as("dim"),
            round(aggregate(col("embedding"), lit(0.0d),
              (acc, x) => acc + x.cast("double") * x.cast("double")), 6).as("norm2"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH upd AS (
             |  SELECT e.vec_id,
             |    CASE WHEN e.vec_id IN (1,2,3) THEN (SELECT embedding FROM embeddings WHERE vec_id = 0)
             |         ELSE e.embedding END AS embedding
             |  FROM embeddings e)
             |SELECT vec_id, vec_id IN (1,2,3) AS was_updated,
             |  CAST(len(embedding) AS INT) AS dim,
             |  round(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)), 6) AS norm2
             |FROM upd ORDER BY vec_id""".stripMargin)),

    // V1+V2+V3 composed: chunk → pseudo-embed (deterministic V1 stand-in)
    // → cosine top-5 chunks for a fixed query — the full indexing flow as
    // one distributed query. The portable md5 hash makes the whole chain
    // DuckDB-reproducible: bucket sums are exact ±1 integers, the only
    // rounding is the final /norm float cast, mirrored with ::FLOAT::DOUBLE.
    "v1_chunk_embed_search" -> Q(
      (s, d) => {
        import s.implicits._
        GraftFunctions.register(s)
        val chunks = T(s, d, "documents")
          .filter(col("doc_id") < 100)
          .select(col("doc_id"), GraftFunctions.chunkText(col("text"), 200, 50))
        val emb = Rag.pseudoEmbedBulk(chunks, Seq("doc_id", "chunk_idx"), "chunk",
            dim = 32, portable = true)
          .withColumn("chunk_id",
            concat(col("doc_id").cast("string"), lit("#"), col("chunk_idx").cast("string")))
        val qvec = Seq("spark table scan merge").toDF("q")
          .select(Rag.pseudoEmbedPortable(col("q"), 32).as("e"))
          .head().getSeq[Float](0).toArray
        Rag.knn(emb, "chunk_id", "embedding", qvec, k = 5, minScore = -1.0)
          .select(col("chunk_id"), round(col("score"), 6).as("score"))
      },
      Some(s"""WITH chunks AS (
             |  SELECT doc_id, CAST(s // 150 AS INT) AS chunk_idx,
             |         substr(text, CAST(s + 1 AS INT), 200) AS chunk
             |  FROM (SELECT doc_id, text,
             |          unnest(CASE WHEN length(text) <= 200 THEN [CAST(0 AS BIGINT)]
             |                 ELSE range(0, length(text), 150) END) AS s
             |        FROM documents WHERE doc_id < 100) t),
             |toks AS (
             |  SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(chunk_idx AS VARCHAR) AS chunk_id,
             |         ${md5HashSql("tok")} AS h
             |  FROM (SELECT doc_id, chunk_idx,
             |          unnest(list_filter(regexp_split_to_array(lower(chunk), '\\s+'), t -> length(t) > 0)) AS tok
             |        FROM chunks) u),
             |bsums AS (SELECT chunk_id, h % 32 AS d,
             |    CAST(SUM(CASE WHEN h % 64 < 32 THEN 1.0 ELSE -1.0 END) AS DOUBLE) AS v
             |  FROM toks GROUP BY 1, 2),
             |dims AS (SELECT unnest(range(0, 32)) AS d),
             |grid AS (SELECT c.chunk_id, dims.d, COALESCE(b.v, 0.0) AS v
             |  FROM (SELECT DISTINCT chunk_id FROM bsums) c
             |  CROSS JOIN dims LEFT JOIN bsums b ON b.chunk_id = c.chunk_id AND b.d = dims.d),
             |norms AS (SELECT chunk_id, sqrt(SUM(v * v)) AS nrm FROM grid GROUP BY chunk_id),
             |vecs AS (SELECT g.chunk_id, list((g.v / n.nrm)::FLOAT::DOUBLE ORDER BY g.d) AS vec
             |  FROM grid g JOIN norms n ON g.chunk_id = n.chunk_id
             |  WHERE n.nrm > 0 GROUP BY g.chunk_id),
             |qtoks AS (SELECT ${md5HashSql("tok")} AS h
             |  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower('spark table scan merge'), '\\s+'),
             |                                  t -> length(t) > 0)) AS tok) qt),
             |qsums AS (SELECT h % 32 AS d,
             |    CAST(SUM(CASE WHEN h % 64 < 32 THEN 1.0 ELSE -1.0 END) AS DOUBLE) AS v
             |  FROM qtoks GROUP BY 1),
             |qgrid AS (SELECT dims.d, COALESCE(q.v, 0.0) AS v FROM dims LEFT JOIN qsums q ON q.d = dims.d),
             |qnorm AS (SELECT sqrt(SUM(v * v)) AS nrm FROM qgrid),
             |qvec AS (SELECT list((g.v / n.nrm)::FLOAT::DOUBLE ORDER BY g.d) AS qv FROM qgrid g, qnorm n),
             |pairs AS (SELECT v.chunk_id, unnest(v.vec) AS x, unnest(q.qv) AS y FROM vecs v, qvec q),
             |scores AS (SELECT chunk_id, SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))) AS s
             |  FROM pairs GROUP BY chunk_id),
             |topk AS (SELECT chunk_id, s FROM scores ORDER BY s DESC, chunk_id LIMIT 5)
             |SELECT chunk_id, round(s, 6) AS score FROM topk""".stripMargin)),

    // ANN scale path (hyperplane LSH prune + exact rerank) — the seed-fixed
    // planes are embedded as SQL literals, so the oracle recomputes the
    // identical signatures, Hamming prune, and rerank (hash-green); parity
    // with brute force is additionally pinned in RagSpec
    "v3_ann_knn" -> Q(
      (s, d) => {
        val q = queryVec(s, d)
        val planes = Rag.hyperplanes(dim = q.length, nBits = 16, seed = 42L)
        val sigged = Rag.withSignature(
          TestData.embeddings(s, d).filter(col("vec_id") =!= 0), "embedding", planes)
        Rag.annKnn(sigged, "vec_id", "embedding", q, planes, k = 10,
            minScore = -1.0, maxHamming = 8)
          .select(col("vec_id"), round(col("score"), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
      },
      Some {
        val planes = Rag.hyperplanes(dim = 64, nBits = 16, seed = 42L)
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
           |qsig AS (SELECT ${planeSigSql(planes, "qv")} AS qs FROM q),
           |sigs AS (SELECT vec_id, embedding, ${planeSigSql(planes, "embedding")} AS sig
           |  FROM embeddings WHERE vec_id <> 0),
           |cand AS (SELECT s.vec_id, s.embedding FROM sigs s, qsig
           |  WHERE bit_count(xor(s.sig, qsig.qs)) <= 8),
           |pairs AS (SELECT c.vec_id, unnest(c.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
           |  FROM cand c, q),
           |scores AS (SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS s
           |  FROM pairs GROUP BY vec_id),
           |topk AS (SELECT vec_id, s FROM scores ORDER BY s DESC, vec_id LIMIT 10)
           |SELECT vec_id, round(s, 6) AS score FROM topk ORDER BY score DESC, vec_id""".stripMargin
      }),

    // IVF scale path (coarse-quantizer cells + probe prune + exact rerank) —
    // centroids are engine-side trained constants, no SQL twin → rows-only;
    // exhaustive-probe parity with brute force is pinned in IvfSpec
    // PQ two-stage retrieve through the REAL path (train → encode → ADC
    // rank over codes only → exact rerank). rerank = corpus makes the
    // result exactly brute force, so the plain cosine SQL is its oracle;
    // ADC-only ranking quality at small rerank is pinned in PqSpec.
    "v3_pq_knn" -> Q(
      (s, d) => {
        val q = queryVec(s, d)
        val emb = TestData.embeddings(s, d)
          .filter(col("vec_id") =!= 0 && col("embedding").isNotNull)
        val model = graft.rag.Pq.train(emb, "vec_id", "embedding", m = 8, ks = 16)
        val coded = graft.rag.Pq.withCodes(emb, "embedding", model)
        graft.rag.Pq.pqKnn(coded, "vec_id", "embedding", q, model,
            k = 10, rerank = emb.count().toInt)
          .select(col("vec_id"), round(col("score"), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
      },
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
             |pairs AS (SELECT e.vec_id AS vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
             |          FROM embeddings e, q WHERE e.vec_id <> 0 AND e.embedding IS NOT NULL),
             |scores AS (SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS s
             |           FROM pairs GROUP BY vec_id),
             |topk AS (SELECT vec_id, s FROM scores ORDER BY s DESC, vec_id LIMIT 10)
             |SELECT vec_id, round(s, 6) AS score FROM topk
             |ORDER BY score DESC, vec_id""".stripMargin)),

    "v3_ivf_knn" -> Q(
      (s, d) => {
        val q = queryVec(s, d)
        val emb = TestData.embeddings(s, d)
          .filter(col("vec_id") =!= 0 && col("embedding").isNotNull)
        val model = graft.rag.Ivf.train(emb, "vec_id", "embedding", nCells = 8)
        // stash the trained constants for the post-run oracle (see
        // ivfOracleState) — probesFor is the same deterministic call
        // ivfKnn makes internally
        ivfOracleState.set((model.centroids, model.probesFor(q, 4)))
        val cells = graft.rag.Ivf.withCell(emb, "embedding", model)
        graft.rag.Ivf.ivfKnn(cells, "vec_id", "embedding", q, model,
            k = 10, minScore = -1.0, nProbe = 4)
          .select(col("vec_id"), round(col("score"), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
      },
      Option(ivfOracleState.get()).map(ivfOracleSqlFor)),

    // Recall@10 instrumentation for every approximate index vs brute
    // force — "recall at what cost" is the first question a user asks an
    // ANN index. Params are deliberately lossy (maxHamming=6, nProbe=2,
    // rerank=20) so the approximation is visible, not vacuously 1.0. The
    // oracle replays all three index paths from the stashed trained
    // constants (same move as v3_ivf_knn) and counts the overlap.
    "v9_recall" -> Q(
      (s, d) => {
        val q = queryVec(s, d)
        val emb = TestData.embeddings(s, d)
          .filter(col("vec_id") =!= 0 && col("embedding").isNotNull)
        val brute = Rag.knn(emb, "vec_id", "embedding", q, k = 10, minScore = -1.0)
        val planes = Rag.hyperplanes(dim = q.length, nBits = 16, seed = 42L)
        val ann = Rag.annKnn(Rag.withSignature(emb, "embedding", planes),
          "vec_id", "embedding", q, planes, k = 10, minScore = -1.0, maxHamming = 6)
        val ivfModel = graft.rag.Ivf.train(emb, "vec_id", "embedding", nCells = 8)
        val ivf = graft.rag.Ivf.ivfKnn(
          graft.rag.Ivf.withCell(emb, "embedding", ivfModel),
          "vec_id", "embedding", q, ivfModel, k = 10, minScore = -1.0, nProbe = 2)
        val pqModel = graft.rag.Pq.train(emb, "vec_id", "embedding", m = 8, ks = 16)
        val coded = graft.rag.Pq.withCodes(emb, "embedding", pqModel)
        // two PQ operating points: the rerank budget IS the recall dial —
        // the number a user turns before trusting the index
        val pq20 = graft.rag.Pq.pqKnn(coded, "vec_id", "embedding", q, pqModel,
          k = 10, rerank = 20)
        val pq50 = graft.rag.Pq.pqKnn(coded, "vec_id", "embedding", q, pqModel,
          k = 10, rerank = 50)
        recallOracleState.set(RecallState(ivfModel.centroids,
          ivfModel.probesFor(q, 2), pqModel.books, pqModel.subDim,
          pqModel.adcTable(q)))
        // SQ8: the 4× compression point — int8 storage, cosine computed in
        // the quantized domain (per-vector scales cancel)
        val sq8 = Rag.sq8Knn(emb, "vec_id", "embedding", q, k = 10)
        Seq("ann_lsh" -> ann, "ivf" -> ivf,
            "pq_adc_r20" -> pq20, "pq_adc_r50" -> pq50, "sq8" -> sq8).map { case (nm, df) =>
          Rag.recallAtK(df, brute, "vec_id", k = 10)
            .withColumn("index_kind", lit(nm))
        }.reduce(_.unionByName(_))
          .select(col("index_kind"), col("n_hits"), col("recall"))
          .orderBy(col("index_kind"))
      },
      Option(recallOracleState.get()).map(recallOracleSqlFor))
  )

  /** Post-run oracle state for v9_recall (same mechanism as
    * [[ivfOracleState]]): the trained IVF centroids + probes, PQ codebooks,
    * and the query's ADC table, stashed by the query run and embedded as
    * SQL literals when `oracleSql` is evaluated afterwards. */
  private final case class RecallState(ivfCents: Array[Array[Float]],
                                       ivfProbes: Seq[Int],
                                       books: Array[Array[Array[Float]]],
                                       subDim: Int,
                                       adc: Array[Array[Double]])
  private val recallOracleState =
    new java.util.concurrent.atomic.AtomicReference[RecallState]()

  private def recallOracleSqlFor(st: RecallState): String = {
    val planes = Rag.hyperplanes(dim = 64, nBits = 16, seed = 42L)
    val ivfD = st.ivfCents.indices
      .map(i => s"(${ivfDotSql(st.ivfCents(i), "embedding")}) AS d$i")
      .mkString(",\n      ")
    val ivfCase = firstMaxCaseSql(st.ivfCents.indices.map(i => s"d$i"))
    val m = st.books.length
    // per-(subspace, code) assignment score: dot(sub, c) − ‖c‖²/2 — the
    // exact expression Pq.codesFor evaluates (argmin L2 == argmax this)
    val pqScores = (0 until m).flatMap { sIdx =>
      st.books(sIdx).zipWithIndex.toSeq.map { case (c, ci) =>
        val n2h = c.map(x => x.toDouble * x.toDouble).sum / 2.0
        s"(${ivfDotSql(c, "embedding", off = sIdx * st.subDim)} - ($n2h)) AS p${sIdx}_$ci"
      }
    }.mkString(",\n      ")
    val pqCodes = (0 until m).map { sIdx =>
      s"(${firstMaxCaseSql(st.books(sIdx).indices.map(ci => s"p${sIdx}_$ci"))}) AS c$sIdx"
    }.mkString(",\n      ")
    val adcExpr = (0 until m).map { sIdx =>
      s"(${st.adc(sIdx).map(_.toString).mkString("[", ", ", "]")}[c$sIdx + 1])"
    }.mkString(" + ")
    def cosTop(cand: String, pfx: String) =
      s"""${pfx}pairs AS (SELECT c.vec_id, unnest(c.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
         |  FROM $cand c, q),
         |${pfx}top AS (SELECT vec_id FROM (
         |  SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS s
         |  FROM ${pfx}pairs GROUP BY vec_id) sc ORDER BY s DESC, vec_id LIMIT 10)""".stripMargin
    def recallRow(kind: String, top: String) =
      s"""SELECT '$kind' AS index_kind,
         |  (SELECT count(*) FROM $top t JOIN btop b USING (vec_id)) AS n_hits,
         |  round((SELECT count(*) FROM $top t JOIN btop b USING (vec_id))::DOUBLE / 10, 6) AS recall""".stripMargin
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |emb0 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0 AND embedding IS NOT NULL),
       |${cosTop("emb0", "b")},
       |qsig AS (SELECT ${planeSigSql(planes, "qv")} AS qs FROM q),
       |acand AS (SELECT e.vec_id, e.embedding FROM (
       |    SELECT vec_id, embedding, ${planeSigSql(planes, "embedding")} AS sig FROM emb0) e, qsig
       |  WHERE bit_count(xor(e.sig, qsig.qs)) <= 6),
       |${cosTop("acand", "a")},
       |icand AS (SELECT vec_id, embedding FROM (
       |    SELECT vec_id, embedding, $ivfCase AS cell FROM (
       |      SELECT vec_id, embedding,
       |      $ivfD
       |      FROM emb0) dd) cc
       |  WHERE cell IN (${st.ivfProbes.mkString(", ")})),
       |${cosTop("icand", "i")},
       |pqs AS (SELECT vec_id, embedding,
       |      $pqCodes
       |    FROM (SELECT vec_id, embedding,
       |      $pqScores
       |      FROM emb0) ps),
       |padc AS (SELECT vec_id, embedding, $adcExpr AS adc FROM pqs),
       |pcand AS (SELECT vec_id, embedding FROM padc ORDER BY adc DESC, vec_id LIMIT 20),
       |${cosTop("pcand", "p")},
       |pcand50 AS (SELECT vec_id, embedding FROM padc ORDER BY adc DESC, vec_id LIMIT 50),
       |${cosTop("pcand50", "p5")},
       |q8 AS (SELECT list_transform(qv, x -> floor(x::DOUBLE / (CASE WHEN qm = 0 THEN 1.0 ELSE qm / 127.0 END) + 0.5)) AS v8
       |  FROM (SELECT qv, list_max(list_transform(qv, y -> abs(y::DOUBLE))) AS qm FROM q)),
       |s8 AS (SELECT vec_id, list_transform(embedding, x -> floor(x::DOUBLE / sc + 0.5)) AS v8
       |  FROM (SELECT vec_id, embedding, CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS sc
       |        FROM (SELECT vec_id, embedding,
       |                list_max(list_transform(embedding, y -> abs(y::DOUBLE))) AS m
       |              FROM emb0) mm) ss),
       |spairs AS (SELECT s.vec_id, unnest(s.v8) AS x, unnest(q8.v8) AS y FROM s8 s, q8),
       |stop8 AS (SELECT vec_id FROM (
       |  SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS sc2
       |  FROM spairs GROUP BY vec_id HAVING SUM(x*x) > 0) z
       |  ORDER BY sc2 DESC, vec_id LIMIT 10)
       |SELECT * FROM (
       |${recallRow("ann_lsh", "atop")}
       |UNION ALL
       |${recallRow("ivf", "itop")}
       |UNION ALL
       |${recallRow("pq_adc_r20", "ptop")}
       |UNION ALL
       |${recallRow("pq_adc_r50", "p5top")}
       |UNION ALL
       |${recallRow("sq8", "stop8")}) r
       |ORDER BY index_kind""".stripMargin
  }

  /**
   * Post-run IVF oracle state: (trained centroids, probed cell ids). The
   * v3_ivf_knn query stores the constants it trained (seed-deterministic —
   * `Ivf.train` samples by portable hash order and runs a fixed driver
   * Lloyd loop); `oracleSql` is evaluated by Verify AFTER every query has
   * run, so the SQL twin embeds those exact floats as literals — the same
   * move v3_ann_knn makes with its seed-fixed hyperplanes. Before the
   * query has run the entry is absent (rows-only), never wrong.
   */
  private val ivfOracleState =
    new java.util.concurrent.atomic.AtomicReference[(Array[Array[Float]], Seq[Int])]()

  /** Sequential left-to-right double dot — bit-identical to DotProduct's
    * accumulation loop (float element → double product → running sum).
    * `off` shifts the vector index for subspace slices (PQ). */
  private def ivfDotSql(c: Array[Float], v: String, off: Int = 0): String =
    c.zipWithIndex
      .map { case (w, j) => s"$v[${off + j + 1}]::DOUBLE * (${w.toDouble})" }
      .mkString(" + ")

  /** First-occurrence-of-max as a CASE chain over `names` — the DuckDB
    * twin of `array_position(scores, array_max(scores)) - 1` (argmax, ties
    * to the lowest index): branch i only needs comparisons against LATER
    * entries, because reaching it means some earlier branch failed. */
  private def firstMaxCaseSql(names: Seq[String]): String = {
    val k = names.length
    (0 until k).map { i =>
      if (i == k - 1) s"ELSE $i"
      else s"WHEN ${((i + 1) until k).map(j => s"${names(i)} >= ${names(j)}").mkString(" AND ")} THEN $i"
    }.mkString("CASE ", " ", " END")
  }

  /** DuckDB twin of cell assign (argmax ties→lowest, mirroring
    * `array_position(dots, array_max(dots)) - 1`) + probe filter + exact
    * cosine rerank top-k. */
  private def ivfOracleSqlFor(state: (Array[Array[Float]], Seq[Int])): String = {
    val (cents, probes) = state
    val k = cents.length
    val dcols = cents.indices
      .map(i => s"(${ivfDotSql(cents(i), "embedding")}) AS d$i")
      .mkString(",\n    ")
    val cellCase = firstMaxCaseSql((0 until k).map(i => s"d$i"))
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |dots AS (SELECT vec_id, embedding,
       |    $dcols
       |  FROM embeddings WHERE vec_id <> 0 AND embedding IS NOT NULL),
       |cand AS (SELECT vec_id, embedding FROM (
       |    SELECT vec_id, embedding, $cellCase AS cell FROM dots) t
       |  WHERE cell IN (${probes.mkString(", ")})),
       |pairs AS (SELECT c.vec_id, unnest(c.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
       |  FROM cand c, q),
       |scores AS (SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS s
       |  FROM pairs GROUP BY vec_id),
       |topk AS (SELECT vec_id, s FROM scores ORDER BY s DESC, vec_id LIMIT 10)
       |SELECT vec_id, round(s, 6) AS score FROM topk ORDER BY score DESC, vec_id""".stripMargin
  }

  // ── graph battery ──────────────────────────────────────────────────────
  /** Directed nation-level trade edges: supplier-nation → customer-nation
    * pairs carrying at least `minLines` lineitems. The "backbone graph" the
    * graph battery traverses (the reference's data model is a graph store —
    * its traversal surface re-expressed over DataFrames; `ops/Graph.scala`). */
  private def tradeEdges(s: SparkSession, d: String, minLines: Long): DataFrame = {
    val sup = broadcast(T(s, d, "supplier")
      .join(T(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("a")))
    val cust = broadcast(T(s, d, "customer")
      .join(T(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("b")))
    T(s, d, "lineitem")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(T(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minLines && col("a") =!= col("b"))
      .select(col("a"), col("b"))
  }

  /** DuckDB twin of [[tradeEdges]] as a CTE named `edges`. */
  private def tradeEdgeSql(minLines: Long): String =
    s"""edges AS (
       |  SELECT a, b FROM (
       |    SELECT n1.n_name AS a, n2.n_name AS b, count(*) AS n
       |    FROM lineitem
       |    JOIN supplier ON l_suppkey = s_suppkey
       |    JOIN nation n1 ON supplier.s_nationkey = n1.n_nationkey
       |    JOIN orders ON l_orderkey = o_orderkey
       |    JOIN customer ON o_custkey = c_custkey
       |    JOIN nation n2 ON customer.c_nationkey = n2.n_nationkey
       |    GROUP BY 1, 2)
       |  WHERE n >= $minLines AND a <> b)""".stripMargin

  /** DuckDB twin of [[graft.ops.Graph.pageRank]] with per-iteration 1e-dp
    * rounding: the power iteration unrolled into chained CTEs (like
    * [[mmrOracleSql]]). Every arithmetic step mirrors the Spark expression
    * tree on identical doubles — (1 − d) computed in-query, dangling mass
    * divided by n at use — so with both engines rounding each iteration to
    * dp decimals, the fixed point is bit-identical. */
  private def pageRankOracleSql(minLines: Long, iters: Int,
                                damping: Double, dp: Int): String = {
    val d = damping.toString
    val steps = (1 to iters).map { i =>
      s"""dng$i AS (SELECT coalesce(sum(r.rank), 0) AS dm
         |  FROM r${i - 1} r LEFT JOIN outdeg o ON r.node = o.node
         |  WHERE o.odeg IS NULL),
         |c$i AS (SELECT e.b AS node, sum(r.rank / o.odeg) AS im
         |  FROM edges e JOIN r${i - 1} r ON e.a = r.node
         |  JOIN outdeg o ON e.a = o.node
         |  GROUP BY e.b),
         |r$i AS MATERIALIZED (SELECT n.node,
         |    round((1 - $d) / nn.n + $d * (coalesce(c.im, 0) + round(g.dm / nn.n, $dp)), $dp) AS rank
         |  FROM nodes n LEFT JOIN c$i c ON n.node = c.node, dng$i g, nn)""".stripMargin
    }.mkString(",\n")
    // every r{i} is referenced twice (dangling + contribs) — without
    // MATERIALIZED DuckDB inlines the chain, expanding 2^iters copies of
    // the base join and exhausting file handles
    s"""WITH ${tradeEdgeSql(minLines).replaceFirst("edges AS \\(", "edges AS MATERIALIZED (")},
       |nodes AS MATERIALIZED (SELECT a AS node FROM edges UNION SELECT b FROM edges),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
       |outdeg AS MATERIALIZED (SELECT a AS node, count(*) AS odeg FROM edges GROUP BY 1),
       |r0 AS MATERIALIZED (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),
       |$steps
       |SELECT node, round(rank, 6) AS rank FROM r$iters ORDER BY node""".stripMargin
  }

  /** DuckDB twin of [[graft.ops.Graph.personalizedPageRank]] on the trade
    * graph with a literal restart set — iterations unrolled as MATERIALIZED
    * chained CTEs, the [[pageRankOracleSql]] pattern with the teleport
    * column in place of the uniform 1/n term. */
  private def pprOracleSql(minLines: Long, restart: Seq[String], iters: Int,
                           damping: Double, dp: Int): String = {
    val d = damping.toString
    val set = restart.map(s => s"'$s'").mkString(", ")
    val steps = (1 to iters).map { i =>
      s"""dng$i AS (SELECT coalesce(sum(r.rank), 0) AS dm
         |  FROM r${i - 1} r LEFT JOIN outdeg o ON r.node = o.node
         |  WHERE o.odeg IS NULL),
         |c$i AS (SELECT e.b AS node, sum(r.rank / o.odeg) AS im
         |  FROM edges e JOIN r${i - 1} r ON e.a = r.node
         |  JOIN outdeg o ON e.a = o.node
         |  GROUP BY e.b),
         |r$i AS MATERIALIZED (SELECT t.node, t.tele,
         |    round((1 - $d) * t.tele + $d * (coalesce(c.im, 0) + round(g.dm, $dp) * t.tele), $dp) AS rank
         |  FROM tn t LEFT JOIN c$i c ON t.node = c.node, dng$i g)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${tradeEdgeSql(minLines).replaceFirst("edges AS \\(", "edges AS MATERIALIZED (")},
       |nodes AS MATERIALIZED (SELECT a AS node FROM edges UNION SELECT b FROM edges),
       |src AS MATERIALIZED (SELECT node FROM nodes WHERE node IN ($set)),
       |ns AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM src),
       |tn AS MATERIALIZED (SELECT n.node,
       |    CASE WHEN s.node IS NULL THEN 0.0 ELSE 1.0 / ns.n END AS tele
       |  FROM nodes n LEFT JOIN src s ON n.node = s.node, ns),
       |outdeg AS MATERIALIZED (SELECT a AS node, count(*) AS odeg FROM edges GROUP BY 1),
       |r0 AS MATERIALIZED (SELECT node, tele, tele AS rank FROM tn),
       |$steps
       |SELECT node, round(rank, 6) AS rank FROM r$iters ORDER BY node""".stripMargin
  }

  private def graphDefs: Seq[(String, Q)] = Seq(

    // Personalized PageRank (round-11): teleport + dangling mass return to
    // the restart set, so ranks measure proximity to it — the
    // recommendation/related-entities primitive. Oracle unrolls the
    // iterations with the teleport column replacing the uniform term.
    "g6_personalized_pagerank" -> Q(
      (s, d) => {
        val sources = T(s, d, "nation")
          .filter(col("n_name").isin("NATION_0", "NATION_1"))
          .select(col("n_name"))
        graft.ops.Graph.personalizedPageRank(tradeEdges(s, d, 120), "a", "b",
            sources, "n_name", iters = 10, roundPerIter = Some(9),
            earlyExitTol = Some(0.0))
          .select(col("node"), round(col("rank"), 6).as("rank"))
          .orderBy(col("node"))
      },
      Some(pprOracleSql(120, Seq("NATION_0", "NATION_1"),
        iters = 10, damping = 0.85, dp = 9))),

    // Min-hop BFS over the (thinned) customer↔supplier bipartite graph —
    // the reference's multi-hop traversal surface. Oracle = bounded
    // recursive CTE with per-level dedup, min(hops) per node.
    "g1_khop_reachability" -> Q(
      (s, d) => {
        val e = T(s, d, "lineitem").filter(col("l_quantity") >= 49)
          .join(T(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c:"), col("o_custkey").cast("string")).as("src"),
            concat(lit("s:"), col("l_suppkey").cast("string")).as("dst"))
          .distinct()
        val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
        // start set comes from the table, not a literal — a foldable start
        // constant-propagates into the first hop and degrades it to a
        // nested-loop join (PlanAuditSpec pins the hash-join shape)
        val start = T(s, d, "customer").filter(col("c_custkey") === 0)
          .select(concat(lit("c:"), col("c_custkey").cast("string")).as("node"))
        graft.ops.Graph.kHop(sym, "src", "dst", start, "node", maxHops = 3)
          .orderBy(col("hops"), col("node"))
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT DISTINCT 'c:' || o_custkey AS src, 's:' || l_suppkey AS dst
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_quantity >= 49),
             |sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
             |walk AS (
             |  SELECT 'c:0' AS node, 0 AS hops
             |  UNION
             |  SELECT sym.dst, walk.hops + 1 FROM walk
             |  JOIN sym ON walk.node = sym.src WHERE walk.hops < 3)
             |SELECT node, CAST(min(hops) AS INT) AS hops
             |FROM walk GROUP BY 1 ORDER BY hops, node""".stripMargin)),

    // Exact triangle count on the undirected trade backbone (canonical
    // a<b<c two-join enumeration — each triangle counted once)
    "g2_trade_triangles" -> Q(
      (s, d) => graft.ops.Graph.triangleCount(tradeEdges(s, d, 120), "a", "b"),
      Some(s"""WITH ${tradeEdgeSql(120)},
              |und AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
              |        FROM edges WHERE a <> b)
              |SELECT count(*) AS n_triangles
              |FROM und e1 JOIN und e2 ON e1.b = e2.a
              |WHERE EXISTS (SELECT 1 FROM und e3
              |              WHERE e3.a = e1.a AND e3.b = e2.b)""".stripMargin)),

    // PageRank on the directed trade backbone — double mass sums are
    // partition-order dependent, so no bit-exact SQL twin exists; the
    // analytic/power-iteration pins live in GraphSpec (rows-only here)
    // per-iteration 1e-9 rounding (numerically immaterial, sub-noise-scale)
    // pins the power iteration bit-for-bit across engines → a real hash
    // oracle instead of rows-only; GraphSpec pins the unrounded default
    "g3_pagerank" -> Q(
      (s, d) => graft.ops.Graph.pageRank(tradeEdges(s, d, 120), "a", "b",
          iters = 10, roundPerIter = Some(9), earlyExitTol = Some(0.0))
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy(col("node")),
      Some(pageRankOracleSql(120, iters = 10, damping = 0.85, dp = 9))),

    // Synchronous label-propagation communities (round-11): 3 fixed
    // rounds, most-frequent-neighbor label with smallest-label ties —
    // fully deterministic, so the oracle unrolls the iterations as
    // chained CTEs (the g3_pagerank pattern)
    "g5_label_prop" -> Q(
      (s, d) => graft.ops.Graph.labelPropagation(tradeEdges(s, d, 120),
          "a", "b", iters = 3)
        .orderBy(col("node")),
      Some {
        val rounds = (1 to 3).map { i =>
          s"""r$i AS (SELECT und.u AS node, l${i - 1}.label AS nl, count(*) AS c
             |  FROM und JOIN l${i - 1} ON und.v = l${i - 1}.node GROUP BY 1, 2),
             |l$i AS (SELECT node, nl AS label FROM (
             |  SELECT node, nl, row_number() OVER (
             |    PARTITION BY node ORDER BY c DESC, nl) AS rn FROM r$i) t
             |  WHERE rn = 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${tradeEdgeSql(120)},
           |und AS (SELECT a AS u, b AS v FROM edges WHERE a <> b
           |        UNION SELECT b, a FROM edges WHERE a <> b),
           |l0 AS (SELECT DISTINCT u AS node, u AS label FROM und),
           |$rounds
           |SELECT node, label FROM l3 ORDER BY node""".stripMargin
      }),

    // Degree profile of the trade backbone (out/in/total per node) — the
    // skew census every traversal planner needs
    "g4_degrees" -> Q(
      (s, d) => graft.ops.Graph.degrees(tradeEdges(s, d, 120), "a", "b")
        .orderBy(col("node")),
      Some(s"""WITH ${tradeEdgeSql(120)},
              |o AS (SELECT a AS node, count(*) AS out_deg FROM edges GROUP BY 1),
              |i AS (SELECT b AS node, count(*) AS in_deg FROM edges GROUP BY 1)
              |SELECT node,
              |  CAST(coalesce(out_deg, 0) AS BIGINT) AS out_deg,
              |  CAST(coalesce(in_deg, 0) AS BIGINT) AS in_deg,
              |  CAST(coalesce(out_deg, 0) + coalesce(in_deg, 0) AS BIGINT) AS degree
              |FROM o FULL OUTER JOIN i USING (node)
              |ORDER BY node""".stripMargin))
  )

  private def curationDefs: Seq[(String, Q)] = Seq(

    // Exact corpus-wide heavy hitters (top-k frequent tokens + counts):
    // groupBy + TakeOrderedAndProject — the distinct set is never sorted
    "cu_heavy_hitters" -> Q(
      (s, d) => graft.ops.Curation.heavyHitters(
        T(s, d, "documents").select(
          explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok")),
        col("tok"), k = 20),
      Some("""SELECT value, count(*) AS n FROM (
             |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                            t -> length(t) > 0)) AS value
             |  FROM documents)
             |GROUP BY 1 ORDER BY n DESC, value LIMIT 20""".stripMargin)),

    // Deterministic domain mixing (portable md5-Bernoulli per row) + audit:
    // corpus composition is reproducible bit-for-bit on any engine
    // deterministic train/val/test split audit: cumulative thresholds over
    // the portable uniform (thresholds interpolated from the same doubles)
    "cu_split_assign" -> Q(
      (s, d) => graft.ops.Curation.splitAssign(T(s, d, "documents"), "doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .groupBy(col("split")).agg(count(lit(1)).as("n"))
        .orderBy(col("split")),
      Some(s"""SELECT CASE WHEN u < 0.8 THEN 'train'
             |            WHEN u < 0.9 THEN 'val'
             |            ELSE 'test' END AS split, count(*) AS n
             |FROM (SELECT CAST('0x' || substr(md5('split|' || doc_id), 1, 15) AS BIGINT)
             |        % 10000 / 10000.0 AS u
             |      FROM documents)
             |GROUP BY 1 ORDER BY split""".stripMargin)),

    // temperature rebalancing audit: q_s ∝ n_s^0.5 keep-rates from the
    // corpus itself, deterministic hash-Bernoulli application
    "cu_temperature_mix" -> Q(
      (s, d) => graft.ops.Curation.temperatureMix(
          T(s, d, "documents"), "doc_id", "source", tau = 0.5, targetFrac = 0.5)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
          first(col("__keep_rate")).as("keep_rate"))
        .orderBy(col("source")),
      Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS total_n, sum(pow(n, 0.5)) AS z FROM c),
             |r AS (SELECT source, round(least(1.0,
             |        0.5 * total_n * pow(n, 0.5) / z / n), 6) AS keep_rate FROM c, t),
             |k AS (SELECT d.source, r.keep_rate,
             |        CAST('0x' || substr(md5('temp|' || d.doc_id), 1, 15) AS BIGINT)
             |          % 10000 / 10000.0 < r.keep_rate AS kept
             |      FROM documents d JOIN r USING (source))
             |SELECT source, count(*) AS n_total,
             |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  keep_rate
             |FROM k GROUP BY source, keep_rate ORDER BY source""".stripMargin)),

    "cu_weighted_mix" -> Q(
      (s, d) => graft.ops.Curation.mixAudit(
          graft.ops.Curation.weightedMix(T(s, d, "documents"), "doc_id", "source",
            rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
            defaultRate = 0.1),
          "source")
        .select(col("source"), col("n_total"), col("n_kept"),
          round(col("realized_rate"), 6).as("realized_rate"))
        .orderBy(col("source")),
      Some("""SELECT source, count(*) AS n_total,
             |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  round(sum(CASE WHEN kept THEN 1 ELSE 0 END)
             |        / CAST(count(*) AS DOUBLE), 6) AS realized_rate
             |FROM (SELECT source,
             |        CAST('0x' || substr(md5('mix|' || doc_id), 1, 15) AS BIGINT)
             |          % 10000 / 10000.0 <
             |        CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
             |                    WHEN 'src2' THEN 0.25 ELSE 0.1 END AS kept
             |      FROM documents)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Quantile binning into quality tiers (deterministic ntile: total order
    // with id tiebreak), rolled up per bin
    // Count-min heavy hitters (the sketch scale path): sample→candidates,
    // sketch→selection, exact verify pass → output counts are exact, so the
    // exact top-k IS the oracle. Deterministic: xxhash64 buckets + hashed
    // row sample, no rand().
    "cu_cm_topk" -> Q(
      (s, d) => graft.ops.Curation.cmTopK(
        T(s, d, "documents").select(col("doc_id"),
          posexplode(graft.text.TextAnalysis.tokens(col("text")))
            .as(Seq("pos", "tok"))),
        rowKey = concat_ws("#", col("doc_id"), col("pos")),
        value = col("tok"), k = 10),
      Some("""SELECT value, count(*) AS n FROM (
             |  SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                            t -> length(t) > 0)) AS value
             |  FROM documents)
             |GROUP BY 1 ORDER BY n DESC, value LIMIT 10""".stripMargin)),

    // Cutpoint binning (the shuffle-free scale path of cu_quality_bins):
    // exact interpolated percentiles (DuckDB quantile_cont twin) collected
    // once, binning as a scalar expression over the scan
    "cu_cutpoint_bins" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents")
        val cuts = graft.ops.Curation.percentileCutpoints(docs, col("n_chars"), n = 10)
        graft.ops.Curation.binByCutpoints(docs, col("n_chars"), cuts)
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
          .orderBy(col("bin"))
      },
      Some("""WITH c AS (
             |  SELECT quantile_cont(n_chars, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts
             |  FROM documents)
             |SELECT bin, count(*) AS n_docs,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM (SELECT n_chars,
             |        1 + CAST(n_chars > cuts[1] AS INT) + CAST(n_chars > cuts[2] AS INT)
             |          + CAST(n_chars > cuts[3] AS INT) + CAST(n_chars > cuts[4] AS INT)
             |          + CAST(n_chars > cuts[5] AS INT) + CAST(n_chars > cuts[6] AS INT)
             |          + CAST(n_chars > cuts[7] AS INT) + CAST(n_chars > cuts[8] AS INT)
             |          + CAST(n_chars > cuts[9] AS INT) AS bin
             |      FROM documents, c)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Crawl curation: subdomain-aware domain blocklist as equi joins over
    // the suffix chain. URLs synthesized deterministically from doc_id
    // (identical in both engines); the oracle uses the naive LIKE-suffix
    // form — same semantics, nested-loop shape we deliberately avoid
    "web_domain_block" -> Q(
      (s, d) => {
        import s.implicits._
        val docs = T(s, d, "documents").select(col("doc_id"),
          concat(lit("https://"),
            when(pmod(col("doc_id"), lit(3)) === 0, lit("cdn.")).otherwise(lit("")),
            lit("d"), pmod(col("doc_id"), lit(40)).cast("string"),
            lit(".example.com/p/"), col("doc_id").cast("string")).as("url"))
        val blocklist = Seq("d1.example.com", "d7.example.com",
          "d13.example.com", "d28.example.com").toDF("domain")
        graft.ops.Web.blockByDomain(docs, "doc_id", col("url"), blocklist)
          .orderBy(col("doc_id"))
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |    'https://' || CASE WHEN doc_id % 3 = 0 THEN 'cdn.' ELSE '' END
             |      || 'd' || (doc_id % 40)::VARCHAR || '.example.com/p/'
             |      || doc_id::VARCHAR AS url
             |  FROM documents),
             |b(domain) AS (VALUES ('d1.example.com'), ('d7.example.com'),
             |                     ('d13.example.com'), ('d28.example.com')),
             |d AS (SELECT doc_id, url,
             |        lower(regexp_extract(url,
             |          '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)', 1)) AS dom
             |      FROM u)
             |SELECT doc_id, url FROM d
             |WHERE NOT EXISTS (SELECT 1 FROM b
             |                  WHERE dom = b.domain OR dom LIKE '%.' || b.domain)
             |ORDER BY doc_id""".stripMargin)),

    // Per-source quota caps (fixed-count companion to the rate-based mix):
    // portable md5 hash order, so DuckDB reproduces the exact sample
    "cu_quota_sample" -> Q(
      (s, d) => graft.ops.Curation.quotaSample(
          T(s, d, "documents"), "doc_id", "source", quota = 25)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, source FROM (
             |  SELECT doc_id, source,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY md5('quota|' || doc_id::VARCHAR), doc_id) AS rk
             |  FROM documents) t
             |WHERE rk <= 25 ORDER BY doc_id""".stripMargin)),

    // Greedy per-source token-budget fill: best docs first (type/token
    // ratio as the quality proxy) until the source's cumulative token count
    // hits the budget — the knapsack-ish selection after quality scoring.
    // One partitioned running-sum window = one hash shuffle on source.
    "cu_token_budget" -> Q(
      (s, d) => {
        val toks = graft.text.TextAnalysis.tokens(col("text"))
        graft.ops.Curation.tokenBudget(
            T(s, d, "documents")
              .select(col("doc_id"), col("source"),
                size(toks).cast("long").as("n_tokens"),
                graft.text.TextAnalysis.typeTokenRatio(col("text")).as("__ttr")),
            "doc_id", "source", col("n_tokens"), col("__ttr"), budget = 700L)
          .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_weight"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH scored AS (
             |  SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_tokens,
             |    CASE WHEN len(t) > 0
             |         THEN len(list_distinct(t)) * 1.0 / len(t) END AS ttr
             |  FROM (SELECT doc_id, source,
             |          list_filter(regexp_split_to_array(text, '\s+'),
             |                      x -> length(x) > 0) AS t
             |        FROM documents)),
             |runsum AS (
             |  SELECT doc_id, source, n_tokens,
             |    CAST(sum(n_tokens) OVER (PARTITION BY source
             |      ORDER BY ttr DESC, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight
             |  FROM scored)
             |SELECT doc_id, source, n_tokens, cum_weight
             |FROM runsum WHERE cum_weight <= 700
             |ORDER BY doc_id""".stripMargin)),

    // Deterministic corpus shuffle (epoch ordering): head of the permutation
    // with its position — the position is what makes order hash-checkable.
    // Scale path: TakeOrderedAndProject top-100 + bounded self-join
    // numbering (Curation.shuffleHead) — no single-partition WindowExec.
    "cu_corpus_shuffle" -> Q(
      (s, d) => graft.ops.Curation.shuffleHead(
          T(s, d, "documents"), "doc_id", k = 100)
        .select(col("doc_id"), col("pos"))
        .orderBy(col("pos")),
      Some("""SELECT doc_id, pos FROM (
             |  SELECT doc_id, row_number() OVER (
             |    ORDER BY md5('shuffle|' || doc_id::VARCHAR), doc_id) AS pos
             |  FROM documents) t
             |WHERE pos <= 100 ORDER BY pos""".stripMargin)),

    // Decile quality bins via the SCALE path: one percentile pass →
    // cutpoints as broadcast literals → zero-shuffle scalar binning
    // (Curation.percentileCutpoints + binByCutpoints). The global-ntile
    // form (Curation.quantileBins) stays as the semantics cross-check in
    // CurationSpec only — it must never be the benched plan.
    "cu_quality_bins" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents")
        val cuts = graft.ops.Curation.percentileCutpoints(docs, col("n_chars"), 10)
        graft.ops.Curation.binByCutpoints(docs, col("n_chars"), cuts)
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
          .orderBy(col("bin"))
      },
      Some(s"""WITH c AS (SELECT quantile_cont(n_chars,
             |    [${(1 to 9).map(i => s"0.$i").mkString(", ")}]) AS cuts FROM documents),
             |b AS (SELECT n_chars,
             |        1 ${(1 to 9).map(i => s"+ CAST(n_chars > cuts[$i] AS INT)").mkString(" ")} AS bin
             |      FROM documents, c)
             |SELECT bin, count(*) AS n_docs,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin))
  )

  private def analyticsDefs: Seq[(String, Q)] = Seq(

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
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))
  )

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
  private def tpchDefs2: Seq[(String, Q)] = {
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

  /** Shared shingle CTE for the dedup oracles (mirrors Dedup.shingles n=5). */
  private def shingleCte(pred: String): String =
    s"""sh AS (SELECT DISTINCT doc_id, substr(text, CAST(s + 1 AS INT), 5) AS shingle
       |  FROM (SELECT doc_id, text, unnest(range(0, greatest(length(text) - 5, 0) + 1)) AS s
       |        FROM documents $pred) t)""".stripMargin

  /** SQL twin of the portable md5 token hash (Dedup/Rag `portableTokenHash`):
    * first 15 hex chars of md5 parsed as a 60-bit non-negative BIGINT. */
  private def md5HashSql(tok: String): String =
    s"CAST('0x' || substr(md5($tok), 1, 15) AS BIGINT)"

  /** SQL twin of `Dedup.simhashNearDup(portable = true)`: identical md5
    * 60-bit signature (per-bit majority votes), identical band buckets,
    * identical Hamming filter — a full mirror of the banded blocking, so the
    * oracle checks recall semantics too, not just the arithmetic. */
  private def simhashPortableSql(pred: String, maxHamming: Int, bands: Int): String = {
    val bits = graft.dedup.Dedup.PortableSigBits
    val width = bits / bands
    val mask = (1L << width) - 1
    val sums = (0 until bits).map(b => s"sum((h >> $b) & 1) AS s$b").mkString(", ")
    val sigExpr = (0 until bits)
      .map(b => s"(CASE WHEN s$b * 2 > n THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    val bandSelects = (0 until bands)
      .map(i => s"SELECT doc_id, $i AS band, (sig >> ${i * width}) & $mask AS bucket FROM sig")
      .mkString(" UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, ${md5HashSql("tok")} AS h
       |  FROM (SELECT doc_id,
       |          unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> length(t) > 0)) AS tok
       |        FROM documents $pred) t),
       |votes AS (SELECT doc_id, $sums, count(*) AS n FROM toks GROUP BY doc_id),
       |sig AS (SELECT doc_id, $sigExpr AS sig FROM votes),
       |bnd AS ($bandSelects),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
       |SELECT p.id_a, p.id_b, CAST(bit_count(xor(sa.sig, sb.sig)) AS INT) AS hamming
       |FROM pairs p JOIN sig sa ON p.id_a = sa.doc_id JOIN sig sb ON p.id_b = sb.doc_id
       |WHERE bit_count(xor(sa.sig, sb.sig)) <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** SQL twin of `Rag.signature(v, planes)`: per-plane dot product written as
    * a left-associated elementwise sum — IEEE-identical to DotProduct's
    * sequential double fold (plane floats are printed via toDouble, the exact
    * value the Catalyst expression widens to). */
  private def planeSigSql(planes: Array[Array[Float]], v: String): String =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = p.zipWithIndex
        .map { case (w, j) => s"$v[${j + 1}]::DOUBLE * (${w.toDouble})" }
        .mkString(" + ")
      s"(CASE WHEN ($dot) >= 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")

  private def dedupDefs: Seq[(String, Q)] = Seq(

    "dd_exact_groups" -> Q(
      (s, d) => T(s, d, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .select(col("keep_id"), col("n_dups"))
        .orderBy(col("keep_id")),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_dups
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),

    "dd_exact_survivors" -> Q(
      (s, d) => Dedup.exactSurvivors(T(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"))
        .orderBy(col("doc_id")),
      Some("""SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id""")),

    // Train/test contamination: held-out docs (odd ids) whose 5-gram
    // shingles leak from the training split (even ids) — the eval-integrity
    // gate, blocked by shingle exactly like the n-gram Jaccard path
    "dd_contamination" -> Q(
      (s, d) => Dedup.contamination(
          T(s, d, "documents").filter(col("doc_id") < 200), "doc_id", "text",
          isTrain = col("doc_id") % 2 === 0, n = 5)
        .select(col("doc_id"), col("n_shingles"), col("n_shared"),
          round(col("contamination"), 6).as("contamination"))
        .orderBy(col("doc_id")),
      Some(s"""WITH ${shingleCte("WHERE doc_id < 200")},
              |tr AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 2 = 0),
              |te AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 2 = 1),
              |tot AS (SELECT doc_id, count(*) AS n_shingles FROM te GROUP BY 1),
              |shared AS (SELECT doc_id, count(*) AS n_shared
              |           FROM te JOIN tr USING (shingle) GROUP BY 1)
              |SELECT t.doc_id, t.n_shingles,
              |  CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared,
              |  round(coalesce(s.n_shared, 0) / CAST(t.n_shingles AS DOUBLE), 6)
              |    AS contamination
              |FROM tot t LEFT JOIN shared s USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    // Typo-level fuzzy dedup: shingle-blocked candidates, exact levenshtein
    // on a fixed prefix (both engines implement classic edit distance)
    "dd_fuzzy_pairs" -> Q(
      (s, d) => Dedup.fuzzyPairs(
          T(s, d, "documents").filter(col("doc_id") < 500), "doc_id", "text",
          prefixLen = 40, maxDist = 15, n = 5, maxDf = Some(50))
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH p AS (SELECT doc_id, substr(text, 1, 40) AS pre
             |           FROM documents WHERE doc_id < 500),
             |sh AS (SELECT DISTINCT doc_id, substr(pre, CAST(s + 1 AS INT), 5) AS shingle
             |       FROM (SELECT doc_id, pre,
             |               unnest(range(0, greatest(length(pre) - 5, 0) + 1)) AS s
             |             FROM p) t),
             |rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 50),
             |blocked AS (SELECT doc_id, shingle FROM sh JOIN rare USING (shingle)),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |         FROM blocked a JOIN blocked b USING (shingle)
             |         WHERE a.doc_id < b.doc_id)
             |SELECT id_a, id_b, CAST(levenshtein(pa.pre, pb.pre) AS INT) AS dist
             |FROM cand JOIN p pa ON id_a = pa.doc_id JOIN p pb ON id_b = pb.doc_id
             |WHERE levenshtein(pa.pre, pb.pre) <= 15
             |ORDER BY id_a, id_b""".stripMargin)),

    "dd_minhash_signature" -> Q(
      (s, d) => Dedup.minhashSignature(
          T(s, d, "documents").filter(col("doc_id") < 50), "doc_id", "text",
          n = 5, numHashes = 4)
        .orderBy(col("doc_id")),
      Some(s"""WITH ${shingleCte("WHERE doc_id < 50")}
             |SELECT doc_id,
             |  min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |  min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    "dd_lsh_candidates" -> Q(
      (s, d) => {
        val sig = Dedup.minhashSignature(
          T(s, d, "documents").filter(col("doc_id") < 50), "doc_id", "text", 5, 4)
        Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 4, bands = 2)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH ${shingleCte("WHERE doc_id < 50")},
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig)
             |SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |FROM b a JOIN b c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id
             |ORDER BY id_a, id_b""".stripMargin)),

    // pairs → connected components → per-doc cluster label: the step that
    // turns near-dup pairs into a deduplicated corpus. Oracle recomputes the
    // identical md5 LSH pairs, then closes them with a recursive CTE.
    "dd_cluster_labels" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").filter(col("doc_id") < 50)
        val sig = Dedup.minhashSignature(docs, "doc_id", "text", 5, 4)
        val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 4, bands = 2)
        Dedup.connectedComponents(pairs, docs.select(col("doc_id")), "doc_id")
          .select(col("id").as("doc_id"), col("cluster"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE ${shingleCte("WHERE doc_id < 50")},
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig),
             |pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |  FROM b a JOIN b c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |r AS (SELECT doc_id AS id, doc_id AS m FROM documents WHERE doc_id < 50
             |      UNION
             |      SELECT e.src, r.m FROM edges e JOIN r ON e.dst = r.id)
             |SELECT id AS doc_id, min(m) AS cluster FROM r GROUP BY id ORDER BY doc_id""".stripMargin)),

    // incremental near-dup: a new batch (doc_id % 10 = 0) blocked against
    // the precomputed corpus signatures — batch buckets broadcast, corpus
    // never self-joins
    "dd_incremental_lsh" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").filter(col("doc_id") < 200)
        val newDf = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        val corpusDf = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
        Dedup.incrementalLshMatches(
          Dedup.minhashSignature(newDf, "doc_id", "text", 5, 4),
          Dedup.minhashSignature(corpusDf, "doc_id", "text", 5, 4),
          "doc_id", numHashes = 4, bands = 2)
          .orderBy(col("id_new"), col("id_corpus"))
      },
      Some(s"""WITH ${shingleCte("WHERE doc_id < 200")},
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig),
             |nb AS (SELECT doc_id AS id_new, band, bucket FROM b WHERE doc_id % 10 = 0),
             |cb AS (SELECT doc_id AS id_corpus, band, bucket FROM b WHERE doc_id % 10 <> 0)
             |SELECT DISTINCT id_new, id_corpus
             |FROM nb JOIN cb USING (band, bucket)
             |ORDER BY id_new, id_corpus""".stripMargin)),

    // Bloom-guarded incremental EXACT-dedup admission (round-11): the
    // corpus keeps a bloom over xxhash64(text) — a KB artifact that
    // OR-merges on append — and a batch doc that MISSES it is admitted
    // without touching the corpus at all; bloom-positives go through the
    // exact confirm join (hash-keyed, text-compared), which kills the fpp
    // false positives. Output is EXACT, so the oracle is the plain
    // anti-join on content — bloom correctness and join-prune shape are
    // both covered by the hash compare.
    "dd_incremental_exact_bloom" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents")
        val batch = docs.filter(col("doc_id") >= 400)
        val corpus = docs.filter(col("doc_id") < 400)
        Dedup.bloomExactAdmission(batch, corpus, "text",
            expectedItems = 1 << 12, fpp = 0.01)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT b.doc_id, b.source FROM documents b
             |WHERE b.doc_id >= 400
             |  AND NOT EXISTS (SELECT 1 FROM documents c
             |                  WHERE c.doc_id < 400 AND c.text = b.text)
             |ORDER BY b.doc_id""".stripMargin)),

    // Steady-state twin of dd_incremental_lsh: the corpus bucket table is
    // MATERIALIZED to parquet first (the daily artifact a production
    // pipeline maintains with one O(delta) append per batch) and the batch
    // probes it via the prebucketed path — the corpus is never re-signed,
    // never re-exploded; its cost per batch is one columnar scan of a
    // 3-column table. Result is identical to the re-signing path, so the
    // oracle is the same relational replay; hash-green here proves the
    // parquet round-trip preserves the bucket keys bit-exactly.
    "dd_incremental_prebucketed" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").filter(col("doc_id") < 200)
        val newDf = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        val corpusDf = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
        val root = FixtureRoot.fresh("prebucket")
        val bucketDir = root.toString + "/corpus_buckets"
        Dedup.lshBuckets(
            Dedup.minhashSignature(corpusDf, "doc_id", "text", 5, 4),
            "doc_id", numHashes = 4, bands = 2)
          .write.mode("overwrite").parquet(bucketDir)
        Dedup.incrementalLshMatchesPrebucketed(
          Dedup.lshBuckets(
            Dedup.minhashSignature(newDf, "doc_id", "text", 5, 4),
            "doc_id", numHashes = 4, bands = 2),
          s.read.parquet(bucketDir), "doc_id")
          .orderBy(col("id_new"), col("id_corpus"))
      },
      Some(s"""WITH ${shingleCte("WHERE doc_id < 200")},
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig),
             |nb AS (SELECT doc_id AS id_new, band, bucket FROM b WHERE doc_id % 10 = 0),
             |cb AS (SELECT doc_id AS id_corpus, band, bucket FROM b WHERE doc_id % 10 <> 0)
             |SELECT DISTINCT id_new, id_corpus
             |FROM nb JOIN cb USING (band, bucket)
             |ORDER BY id_new, id_corpus""".stripMargin)),

    // Winnowing document fingerprints (MOSS): md5 k-gram hashes, min per
    // sliding window of w hashes, distinct selected hashes per doc. Row-
    // local array arithmetic — the plan has NO shuffle before the final
    // distinct, and the fingerprint density (~2/(w+1)) is the index-size
    // dial. Oracle replays the selection with a window-frame MIN over the
    // exploded gram table — same md5, same boundary rule (docs with fewer
    // than w grams yield one whole-doc window).
    "dd_winnow" -> Q(
      (s, d) => Dedup.winnowFingerprints(
          T(s, d, "documents").filter(col("doc_id") < 300), "doc_id", "text",
          k = 8, w = 4)
        .select(col("id").as("doc_id"), col("fingerprint"))
        .orderBy(col("doc_id"), col("fingerprint")),
      Some("""WITH g AS (SELECT doc_id, i, md5(substr(text, CAST(i AS INT), 8)) AS h,
             |    greatest(length(text) - 8 + 1, 0) AS ng
             |  FROM (SELECT doc_id, text,
             |          unnest(range(1, greatest(length(text) - 8, 0) + 2)) AS i
             |        FROM documents WHERE doc_id < 300) t
             |  WHERE i <= length(text) - 8 + 1),
             |wm AS (SELECT doc_id, i, ng,
             |    min(h) OVER (PARTITION BY doc_id ORDER BY i
             |                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
             |  FROM g)
             |SELECT DISTINCT doc_id, fp AS fingerprint FROM wm
             |WHERE i <= greatest(ng - 4 + 1, 1)
             |ORDER BY doc_id, fingerprint""".stripMargin)),

    // winnow fingerprints → candidate PAIRS (the detection half of the
    // winnow path, structurally the LSH-pairs shape): join only on the
    // selected fingerprint, maxDf caps boilerplate buckets, ≥ minShared
    // filters incidental single-gram collisions. k=20/w=10 chosen where
    // the pair set is discriminative on this corpus (27 of 44k possible
    // pairs at sf0.01), not all-pairs as char-8 grams would be.
    "dd_winnow_pairs" -> Q(
      (s, d) => Dedup.winnowCandidatePairs(
          T(s, d, "documents").filter(col("doc_id") < 300), "doc_id", "text",
          k = 20, w = 10, minShared = 2, maxDf = 10)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH g AS (SELECT doc_id, i, md5(substr(text, CAST(i AS INT), 20)) AS h,
             |    greatest(length(text) - 20 + 1, 0) AS ng
             |  FROM (SELECT doc_id, text,
             |          unnest(range(1, greatest(length(text) - 20, 0) + 2)) AS i
             |        FROM documents WHERE doc_id < 300) t
             |  WHERE i <= length(text) - 20 + 1),
             |wm AS (SELECT doc_id, i, ng,
             |    min(h) OVER (PARTITION BY doc_id ORDER BY i
             |                 ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS fp
             |  FROM g),
             |fps AS (SELECT DISTINCT doc_id, fp FROM wm
             |        WHERE i <= greatest(ng - 10 + 1, 1)),
             |bounded AS (SELECT doc_id, fp FROM (
             |    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
             |    FROM fps) t WHERE df <= 10),
             |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    count(*) AS shared_fps
             |  FROM bounded a JOIN bounded b
             |    ON a.fp = b.fp AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT id_a, id_b, shared_fps FROM pairs
             |WHERE shared_fps >= 2 ORDER BY id_a, id_b""".stripMargin)),

    // winnow pairs → connected components → SURVIVORS: the full winnow-
    // family reduction mirroring dd_cluster_survivors (the minhash capstone):
    // fingerprint-blocked pairs, min-label components, longest-text winner
    // per cluster (ties to min id). Every stage re-uses the proven pieces —
    // winnowCandidatePairs (fingerprint join, maxDf cap), connectedComponents
    // (per-round lineage truncation; a round-11 A/B measured the star-
    // contraction variant 2x slower on this shallow pair graph, so min-label
    // stays), dedupByCluster — so the scale argument
    // is the composition of their individual ones: no all-pairs term, joins
    // only on fingerprint / node id. Oracle closes the identical md5 winnow
    // pairs with the recursive-CTE pattern, then picks the same winner.
    "dd_winnow_survivors" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").filter(col("doc_id") < 300)
        val pairs = Dedup.winnowCandidatePairs(docs, "doc_id", "text",
          k = 20, w = 10, minShared = 2, maxDf = 10)
        val labels = Dedup.connectedComponents(
          pairs, docs.select(col("doc_id")), "doc_id")
        Dedup.dedupByCluster(docs, labels, "doc_id", length(col("text")))
          .select(col("doc_id"), col("cluster"), length(col("text")).as("text_len"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH RECURSIVE g AS (SELECT doc_id, i, md5(substr(text, CAST(i AS INT), 20)) AS h,
             |    greatest(length(text) - 20 + 1, 0) AS ng
             |  FROM (SELECT doc_id, text,
             |          unnest(range(1, greatest(length(text) - 20, 0) + 2)) AS i
             |        FROM documents WHERE doc_id < 300) t
             |  WHERE i <= length(text) - 20 + 1),
             |wm AS (SELECT doc_id, i, ng,
             |    min(h) OVER (PARTITION BY doc_id ORDER BY i
             |                 ROWS BETWEEN CURRENT ROW AND 9 FOLLOWING) AS fp
             |  FROM g),
             |fps AS (SELECT DISTINCT doc_id, fp FROM wm
             |        WHERE i <= greatest(ng - 10 + 1, 1)),
             |bounded AS (SELECT doc_id, fp FROM (
             |    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
             |    FROM fps) t WHERE df <= 10),
             |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
             |  FROM bounded a JOIN bounded b
             |    ON a.fp = b.fp AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |r AS (SELECT doc_id AS id, doc_id AS m FROM documents WHERE doc_id < 300
             |      UNION
             |      SELECT e.src, r.m FROM edges e JOIN r ON e.dst = r.id),
             |lbl AS (SELECT id AS doc_id, min(m) AS cluster FROM r GROUP BY id),
             |ranked AS (SELECT d.doc_id, l.cluster, length(d.text) AS text_len,
             |    row_number() OVER (PARTITION BY l.cluster
             |                       ORDER BY length(d.text) DESC, d.doc_id) AS rn
             |  FROM documents d JOIN lbl l ON d.doc_id = l.doc_id WHERE d.doc_id < 300)
             |SELECT doc_id, cluster, CAST(text_len AS INT) AS text_len
             |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // SemDeDup-style semantic pruning: deterministic centroid seed (per-
    // label decimal-exact means), nearest-centroid assignment (K×dim
    // broadcast), pairwise cosine ONLY within a cluster, smaller-id
    // survivor rule. The all-pairs term is Σ|cluster|², never n² — the
    // property that survives a 1000× corpus. Oracle replays centroids,
    // assignment, and within-cluster pairs relationally.
    "dd_semdedup" -> Q(
      (s, d) => Dedup.semanticDedup(
          TestData.embeddings(s, d).filter(col("vec_id") =!= 0),
          "vec_id", "embedding", "label", minCosine = 0.35)
        .select(col("id").as("vec_id"), col("cluster"), col("max_sim"), col("kept"))
        .orderBy(col("vec_id")),
      Some("""WITH base AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id <> 0),
             |dimsl AS (SELECT label, vec_id, unnest(embedding)::DOUBLE AS x,
             |            generate_subscripts(embedding, 1) AS i FROM base),
             |cent AS (SELECT label AS cl, i,
             |    round(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS m
             |  FROM dimsl GROUP BY label, i),
             |asg AS (SELECT d.vec_id, c.cl,
             |    SUM(d.x * c.m) / (SQRT(SUM(d.x * d.x)) * SQRT(SUM(c.m * c.m))) AS s
             |  FROM dimsl d JOIN cent c ON d.i = c.i GROUP BY d.vec_id, c.cl),
             |best AS (SELECT vec_id, cl AS cluster FROM (
             |    SELECT vec_id, cl, row_number() OVER (
             |      PARTITION BY vec_id ORDER BY round(s, 6) DESC, cl) AS rn FROM asg) t
             |  WHERE rn = 1),
             |bc AS (SELECT b.vec_id, b.embedding, t.cluster FROM base b JOIN best t USING (vec_id)),
             |pd AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
             |    unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
             |  FROM bc a JOIN bc b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
             |ps AS (SELECT ia, ib,
             |    round(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS s
             |  FROM pd GROUP BY ia, ib),
             |ms AS (SELECT ib AS vec_id, max(s) AS max_sim FROM ps GROUP BY ib)
             |SELECT c.vec_id, c.cluster, m.max_sim,
             |  coalesce(m.max_sim, -1.0) < 0.35 AS kept
             |FROM bc c LEFT JOIN ms m USING (vec_id)
             |ORDER BY c.vec_id""".stripMargin)),

    // SemDeDup with TRAINED centroids (k-means proper, the paper's shape):
    // the per-label seed refined by ONE distributed Lloyd iteration —
    // assign to nearest seed centroid, recompute each centroid as the
    // decimal-exact 6dp-rounded mean of its assignees (empty clusters keep
    // their seed) — then the final assignment and within-cluster prune.
    // The oracle replays the ENTIRE training relationally: seed means,
    // assignment argmax, refined means, second assignment, pairwise prune —
    // so it verifies the Lloyd arithmetic itself, not just its consumer.
    "dd_semdedup_trained" -> Q(
      (s, d) => Dedup.semanticDedupTrained(
          TestData.embeddings(s, d).filter(col("vec_id") =!= 0),
          "vec_id", "embedding", "label", minCosine = 0.35, lloydIters = 1)
        .select(col("id").as("vec_id"), col("cluster"), col("max_sim"), col("kept"))
        .orderBy(col("vec_id")),
      Some("""WITH base AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id <> 0),
             |dimsl AS (SELECT label, vec_id, unnest(embedding)::DOUBLE AS x,
             |            generate_subscripts(embedding, 1) AS i FROM base),
             |cent0 AS (SELECT label AS cl, i,
             |    round(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS m
             |  FROM dimsl GROUP BY label, i),
             |asg0s AS (SELECT d.vec_id, c.cl,
             |    SUM(d.x * c.m) / (SQRT(SUM(d.x * d.x)) * SQRT(SUM(c.m * c.m))) AS s
             |  FROM dimsl d JOIN cent0 c ON d.i = c.i GROUP BY d.vec_id, c.cl),
             |asg0 AS (SELECT vec_id, cl FROM (
             |    SELECT vec_id, cl, row_number() OVER (
             |      PARTITION BY vec_id ORDER BY round(s, 6) DESC, cl) AS rn FROM asg0s) t
             |  WHERE rn = 1),
             |cent1n AS (SELECT a.cl, d.i,
             |    round(CAST(sum(CAST(d.x AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS m
             |  FROM dimsl d JOIN asg0 a USING (vec_id) GROUP BY a.cl, d.i),
             |cent1 AS (SELECT c0.cl, c0.i, coalesce(c1.m, c0.m) AS m
             |  FROM cent0 c0 LEFT JOIN cent1n c1 ON c0.cl = c1.cl AND c0.i = c1.i),
             |asg1s AS (SELECT d.vec_id, c.cl,
             |    SUM(d.x * c.m) / (SQRT(SUM(d.x * d.x)) * SQRT(SUM(c.m * c.m))) AS s
             |  FROM dimsl d JOIN cent1 c ON d.i = c.i GROUP BY d.vec_id, c.cl),
             |best AS (SELECT vec_id, cl AS cluster FROM (
             |    SELECT vec_id, cl, row_number() OVER (
             |      PARTITION BY vec_id ORDER BY round(s, 6) DESC, cl) AS rn FROM asg1s) t
             |  WHERE rn = 1),
             |bc AS (SELECT b.vec_id, b.embedding, t.cluster FROM base b JOIN best t USING (vec_id)),
             |pd AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
             |    unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
             |  FROM bc a JOIN bc b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
             |ps AS (SELECT ia, ib,
             |    round(SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))), 6) AS s
             |  FROM pd GROUP BY ia, ib),
             |ms AS (SELECT ib AS vec_id, max(s) AS max_sim FROM ps GROUP BY ib)
             |SELECT c.vec_id, c.cluster, m.max_sim,
             |  coalesce(m.max_sim, -1.0) < 0.35 AS kept
             |FROM bc c LEFT JOIN ms m USING (vec_id)
             |ORDER BY c.vec_id""".stripMargin)),

    // same clustering through the O(log d) large-star/small-star path —
    // the deep-component scale route, checked against the identical
    // recursive-CTE closure oracle
    "dd_cluster_stars" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").filter(col("doc_id") < 50)
        val sig = Dedup.minhashSignature(docs, "doc_id", "text", 5, 4)
        val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 4, bands = 2)
        Dedup.connectedComponentsStars(pairs, docs.select(col("doc_id")), "doc_id")
          .select(col("id").as("doc_id"), col("cluster"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE ${shingleCte("WHERE doc_id < 50")},
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig),
             |pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |  FROM b a JOIN b c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |r AS (SELECT doc_id AS id, doc_id AS m FROM documents WHERE doc_id < 50
             |      UNION
             |      SELECT e.src, r.m FROM edges e JOIN r ON e.dst = r.id)
             |SELECT id AS doc_id, min(m) AS cluster FROM r GROUP BY id ORDER BY doc_id""".stripMargin)),

    // pairs → components → SURVIVORS: the full near-dup reduction ending in
    // a deduplicated corpus (best quality = longest text wins, ties to min
    // id). Oracle closes the identical md5 LSH pairs with a recursive CTE,
    // then picks the same per-cluster winner.
    "dd_cluster_survivors" -> Q(
      (s, d) => {
        val docs = T(s, d, "documents").filter(col("doc_id") < 50)
        val sig = Dedup.minhashSignature(docs, "doc_id", "text", 5, 4)
        val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 4, bands = 2)
        val labels = Dedup.connectedComponents(pairs, docs.select(col("doc_id")), "doc_id")
        Dedup.dedupByCluster(docs, labels, "doc_id", length(col("text")))
          .select(col("doc_id"), col("cluster"), length(col("text")).as("text_len"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE ${shingleCte("WHERE doc_id < 50")},
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig),
             |pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
             |  FROM b a JOIN b c ON a.band = c.band AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |r AS (SELECT doc_id AS id, doc_id AS m FROM documents WHERE doc_id < 50
             |      UNION
             |      SELECT e.src, r.m FROM edges e JOIN r ON e.dst = r.id),
             |lbl AS (SELECT id AS doc_id, min(m) AS cluster FROM r GROUP BY id),
             |ranked AS (SELECT d.doc_id, l.cluster, length(d.text) AS text_len,
             |    row_number() OVER (PARTITION BY l.cluster
             |                       ORDER BY length(d.text) DESC, d.doc_id) AS rn
             |  FROM documents d JOIN lbl l ON d.doc_id = l.doc_id WHERE d.doc_id < 50)
             |SELECT doc_id, cluster, CAST(text_len AS INT) AS text_len
             |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    "dd_ngram_jaccard" -> Q(
      (s, d) => Dedup.ngramJaccardPairs(
          T(s, d, "documents").filter(col("doc_id") < 50), "doc_id", "text",
          n = 5, minJaccard = 0.2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH ${shingleCte("WHERE doc_id < 50")},
             |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |jac AS (SELECT id_a, id_b, i * 1.0 / (sa.sz + sb.sz - i) AS jaccard
             |  FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id)
             |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac
             |WHERE jaccard >= 0.2 ORDER BY id_a, id_b""".stripMargin)),

    // Asymmetric containment (round-11): |A∩B|/|A| per direction — the
    // excerpt/quotation detector Jaccard is blind to (a short doc copied
    // into a long one has tiny Jaccard but containment ≈ 1). Same
    // shared-shingle blocking as dd_ngram_jaccard; oracle replays both
    // normalizations.
    "dd_containment" -> Q(
      (s, d) => Dedup.containmentPairs(
          T(s, d, "documents").filter(col("doc_id") < 50), "doc_id", "text",
          n = 5, minContainment = 0.4)
        .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH ${shingleCte("WHERE doc_id < 50")},
             |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
             |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |cont AS (SELECT id_a, id_b,
             |    round(i * 1.0 / sa.sz, 6) AS c_ab,
             |    round(i * 1.0 / sb.sz, 6) AS c_ba
             |  FROM inter JOIN sizes sa ON id_a = sa.doc_id
             |             JOIN sizes sb ON id_b = sb.doc_id)
             |SELECT id_a, id_b, c_ab, c_ba FROM cont
             |WHERE greatest(c_ab, c_ba) >= 0.4 ORDER BY id_a, id_b""".stripMargin)),

    // portable md5-derived 60-bit simhash + multi-band blocking: the DuckDB
    // oracle recomputes the identical signature, band buckets, and Hamming
    // filter — full hash-checked mirror of the banded near-dup path
    "dd_simhash_neardup" -> Q(
      (s, d) => Dedup.simhashNearDup(
          T(s, d, "documents"), "doc_id", "text", maxHamming = 20, bands = 4,
          portable = true)
        .orderBy(col("id_a"), col("id_b")),
      Some(simhashPortableSql("", maxHamming = 20, bands = 4))),

    // embedding near-dup LSH scale path: seed-fixed hyperplanes embedded as
    // SQL literals so DuckDB computes the identical sign signature, band
    // buckets, Hamming prune, and exact cosine rerank
    "dd_embedding_lsh" -> Q(
      (s, d) => {
        val planes = Rag.hyperplanes(dim = 64, nBits = 16, seed = 42L)
        Dedup.embeddingNearDupLsh(
            T(s, d, "embeddings").filter(col("vec_id") < 200), "vec_id", "embedding",
            minCosine = 0.3, planes, maxHamming = 6, bands = 4)
          .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some {
        val planes = Rag.hyperplanes(dim = 64, nBits = 16, seed = 42L)
        s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
           |sigs AS (SELECT vec_id, embedding, ${planeSigSql(planes, "embedding")} AS sig FROM emb),
           |bnd AS (SELECT vec_id, 0 AS band, (sig >> 0) & 15 AS bucket FROM sigs
           |  UNION ALL SELECT vec_id, 1 AS band, (sig >> 4) & 15 AS bucket FROM sigs
           |  UNION ALL SELECT vec_id, 2 AS band, (sig >> 8) & 15 AS bucket FROM sigs
           |  UNION ALL SELECT vec_id, 3 AS band, (sig >> 12) & 15 AS bucket FROM sigs),
           |pairs AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
           |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
           |pruned AS (SELECT p.id_a, p.id_b FROM pairs p
           |  JOIN sigs sa ON p.id_a = sa.vec_id JOIN sigs sb ON p.id_b = sb.vec_id
           |  WHERE bit_count(xor(sa.sig, sb.sig)) <= 6),
           |cp AS (SELECT p.id_a, p.id_b, unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
           |  FROM pruned p JOIN emb a ON p.id_a = a.vec_id JOIN emb b ON p.id_b = b.vec_id),
           |cos AS (SELECT id_a, id_b, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS c
           |  FROM cp GROUP BY id_a, id_b)
           |SELECT id_a, id_b, round(c, 6) AS cosine FROM cos
           |WHERE c >= 0.3 ORDER BY id_a, id_b""".stripMargin
      }),

    "dd_embedding_neardup" -> Q(
      (s, d) => Dedup.embeddingNearDupBruteForce(
          T(s, d, "embeddings").filter(col("vec_id") < 200), "vec_id", "embedding",
          minCosine = 0.3)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
             |    unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
             |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |  WHERE a.vec_id < 200 AND b.vec_id < 200),
             |s AS (SELECT ia, ib, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS c
             |      FROM p GROUP BY ia, ib)
             |SELECT ia AS id_a, ib AS id_b, round(c, 6) AS cosine FROM s
             |WHERE c >= 0.3 ORDER BY id_a, id_b""".stripMargin)),

    // V4 best-match gate, both outcomes in one fixture: the fixture's best
    // cosine is ~0.33-0.41 at every SF, so the strict 0.8 gate REJECTS
    // (its branch contributes 0 rows — the reference's cache-miss path)
    // while the loose 0.3 gate PASSES the same top-1 (1 row survives; a
    // 0-row result would prove nothing)
    "v4_best_match_gate" -> Q(
      (s, d) => {
        val q = queryVec(s, d)
        val emb = TestData.embeddings(s, d).filter(col("vec_id") =!= 0)
        val strict = Rag.knn(emb, "vec_id", "embedding", q, k = 1, minScore = 0.8)
          .withColumn("gate", lit("strict@0.8"))
        val loose = Rag.knn(emb, "vec_id", "embedding", q, k = 1, minScore = 0.3)
          .withColumn("gate", lit("loose@0.3"))
        strict.unionByName(loose)
          .select(col("gate"), col("vec_id"), round(col("score"), 6).as("score"))
          .orderBy(col("gate"), col("vec_id"))
      },
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
             |pairs AS (SELECT e.vec_id AS vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
             |          FROM embeddings e, q WHERE e.vec_id <> 0),
             |scores AS (SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS s
             |           FROM pairs GROUP BY vec_id),
             |topk AS (SELECT vec_id, s FROM scores ORDER BY s DESC, vec_id LIMIT 1)
             |SELECT gate, vec_id, round(s, 6) AS score FROM (
             |  SELECT 'strict@0.8' AS gate, vec_id, s FROM topk WHERE s >= 0.8
             |  UNION ALL
             |  SELECT 'loose@0.3' AS gate, vec_id, s FROM topk WHERE s >= 0.3) t
             |ORDER BY gate, vec_id""".stripMargin))
  )

  private val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("key", "row", "scan"),
    "fr" -> Seq("merge", "join", "sort"))

  /** DuckDB twin of [[graft.text.Bpe.train]]: the merge loop unrolled into
    * `numMerges` materialized chained CTEs (like [[pageRankOracleSql]]).
    * Round i recomputes adjacent-pair counts from the round i-1 symbol
    * lists, selects the best pair by (count desc, pair asc) — the exact
    * `minBy((-n, a, b))` order — and rebuilds each word's list with the
    * greedy non-overlapping merge: consecutive pairable positions (only
    * possible when left==right) form islands, and greedy left-to-right
    * takes the even offsets of each island. Pure integer counts and string
    * compares, so the match is exact, not tolerance-based. */
  private def bpeTrainOracleSql(numMerges: Int, topWords: Int,
                                minCount: Long = 2L): String = {
    def round(i: Int): String = {
      val prev = s"r${i - 1}"
      s"""best$i AS MATERIALIZED (SELECT syms[j] AS x, syms[j+1] AS y
         |        FROM $prev, unnest(range(1, len(syms))) AS t(j)
         |        GROUP BY 1, 2 ORDER BY SUM(n) DESC, x, y LIMIT 1),
         |m$i AS MATERIALIZED (SELECT w, n, j, syms[j] AS sym, syms[j+1] AS nxt,
         |         (syms[j] = b.x AND syms[j+1] IS NOT DISTINCT FROM b.y AND j < len(syms)) AS pairable
         |       FROM $prev, unnest(range(1, len(syms)+1)) AS t(j), best$i b),
         |starts$i AS MATERIALIZED (SELECT w, j FROM (
         |          SELECT w, j, row_number() OVER (PARTITION BY w, isl ORDER BY j) AS rn FROM (
         |            SELECT w, j, j - row_number() OVER (PARTITION BY w ORDER BY j) AS isl
         |            FROM m$i WHERE pairable) t)
         |        WHERE (rn - 1) % 2 = 0),
         |r$i AS MATERIALIZED (SELECT m.w, m.n,
         |         list(CASE WHEN s.j IS NOT NULL THEN m.sym || m.nxt ELSE m.sym END ORDER BY m.j) AS syms
         |       FROM m$i m
         |       LEFT JOIN starts$i s ON s.w = m.w AND s.j = m.j
         |       LEFT JOIN starts$i p ON p.w = m.w AND p.j = m.j - 1
         |       WHERE p.j IS NULL
         |       GROUP BY m.w, m.n)""".stripMargin
    }
    val out = (1 to numMerges)
      .map(i => s"""SELECT ${i - 1} AS rank, x AS "left", y AS "right" FROM best$i""")
      .mkString(" UNION ALL ")
    s"""WITH wf AS MATERIALIZED (
       |  SELECT word, count(*)::BIGINT AS n FROM (
       |    SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> length(t) > 0)) AS word
       |    FROM documents) GROUP BY word HAVING count(*) >= $minCount
       |  ORDER BY n DESC, word LIMIT $topWords),
       |r0 AS MATERIALIZED (SELECT word AS w, n,
       |  list_transform(range(1, length(word)+1), i -> substr(word, i::INT, 1)) AS syms FROM wf),
       |${(1 to numMerges).map(round).mkString(",\n")}
       |$out ORDER BY rank""".stripMargin
  }

  private def textDefs: Seq[(String, Q)] = Seq(

    "ta_doc_stats" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          length(col("text")).as("n_chars"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          round(coalesce(TextAnalysis.typeTokenRatio(col("text")), lit(0.0)), 6).as("ttr"),
          round(coalesce(TextAnalysis.avgTokenLen(col("text")), lit(0.0)), 6).as("avg_token_len"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
             |  CAST(len(toks) AS INT) AS n_tokens,
             |  round(CASE WHEN len(toks) > 0 THEN len(list_distinct(toks)) * 1.0 / len(toks) ELSE 0 END, 6) AS ttr,
             |  round(CASE WHEN len(toks) > 0 THEN list_sum(list_transform(toks, t -> length(t))) * 1.0 / len(toks) ELSE 0 END, 6) AS avg_token_len,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
             |FROM (SELECT doc_id, text,
             |        list_filter(regexp_split_to_array(text, '\s+'), t -> length(t) > 0) AS toks
             |      FROM documents) t
             |ORDER BY doc_id""".stripMargin)),

    // Composite heuristic quality gate (Gopher/C4-style rule set): per-rule
    // booleans + the verdict + the FIRST failing rule as reject_reason —
    // the keep/drop decision a curation pipeline acts on, not just the raw
    // stats. Pure per-row scalar expressions: zero shuffles before the
    // oracle ORDER BY, so it costs exactly one scan at any corpus size.
    "ta_quality_gate" -> Q(
      (s, d) => TextAnalysis.qualityGate(
          T(s, d, "documents").select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), col("n_tokens"), col("ttr"), col("avg_token_len"),
          col("stop_ratio"), col("ok_len"), col("ok_word_len"),
          col("ok_diversity"), col("ok_stopwords"), col("keep"),
          col("reject_reason"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'),
             |                x -> length(x) > 0) AS toks,
             |    list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                x -> length(x) > 0) AS ltoks
             |  FROM documents),
             |m AS (
             |  SELECT doc_id, len(toks) AS n,
             |    CASE WHEN len(toks) > 0
             |         THEN len(list_distinct(toks)) * 1.0 / len(toks) END AS ttr,
             |    CASE WHEN len(toks) > 0
             |         THEN list_sum(list_transform(toks, x -> length(x))) * 1.0
             |              / len(toks) END AS awl,
             |    CASE WHEN len(ltoks) > 0
             |         THEN len(list_filter(ltoks,
             |                x -> x IN ('the', 'a', 'of', 'and'))) * 1.0
             |              / len(ltoks) END AS sw
             |  FROM t)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             |  round(coalesce(ttr, 0), 6) AS ttr,
             |  round(coalesce(awl, 0), 6) AS avg_token_len,
             |  round(coalesce(sw, 0), 6) AS stop_ratio,
             |  n BETWEEN 20 AND 90 AS ok_len,
             |  awl BETWEEN 3.8 AND 5.2 AS ok_word_len,
             |  ttr >= 0.45 AS ok_diversity,
             |  sw >= 0.02 AS ok_stopwords,
             |  (n BETWEEN 20 AND 90) AND (awl BETWEEN 3.8 AND 5.2)
             |    AND ttr >= 0.45 AND sw >= 0.02 AS keep,
             |  CASE WHEN NOT (n BETWEEN 20 AND 90) THEN 'length_band'
             |       WHEN NOT (awl BETWEEN 3.8 AND 5.2) THEN 'word_len'
             |       WHEN NOT (ttr >= 0.45) THEN 'low_diversity'
             |       WHEN NOT (sw >= 0.02) THEN 'no_stopwords'
             |  END AS reject_reason
             |FROM m ORDER BY doc_id""".stripMargin)),

    // Repetition profile: boilerplate/degenerate-text signal (explode →
    // per-token counts → max per doc; both aggregations map-side combined)
    "ta_repetition" -> Q(
      (s, d) => TextAnalysis.repetitionStats(
          T(s, d, "documents").filter(col("doc_id") < 300), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          round(col("repetition_ratio"), 6).as("repetition_ratio"),
          col("max_tok_freq"))
        .orderBy(col("doc_id")),
      Some("""WITH base AS (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'), t -> length(t) > 0) AS toks
             |  FROM documents WHERE doc_id < 300),
             |stats AS (SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
             |                 CAST(len(list_distinct(toks)) AS INT) AS n_distinct
             |          FROM base),
             |freq AS (SELECT doc_id, tok, count(*) AS c
             |         FROM (SELECT doc_id, unnest(toks) AS tok FROM base) GROUP BY 1, 2),
             |top AS (SELECT doc_id, max(c) AS max_tok_freq FROM freq GROUP BY 1)
             |SELECT s.doc_id, s.n_tokens, s.n_distinct,
             |  round(CASE WHEN s.n_tokens > 0
             |             THEN 1.0 - s.n_distinct / CAST(s.n_tokens AS DOUBLE)
             |             ELSE 0.0 END, 6) AS repetition_ratio,
             |  CAST(coalesce(t.max_tok_freq, 0) AS BIGINT) AS max_tok_freq
             |FROM stats s LEFT JOIN top t USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    "ta_language_id" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.languageId(col("text"), langProfiles).as("lang_pred"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CASE WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
             |       WHEN s_es >= s_fr THEN 'es'
             |       ELSE 'fr' END AS lang_pred
             |FROM (
             |  SELECT doc_id,
             |    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, t -> list_contains(['the','and','of'], t))) * 1.0 / len(toks) ELSE 0 END AS s_en,
             |    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, t -> list_contains(['key','row','scan'], t))) * 1.0 / len(toks) ELSE 0 END AS s_es,
             |    CASE WHEN len(toks) > 0 THEN len(list_filter(toks, t -> list_contains(['merge','join','sort'], t))) * 1.0 / len(toks) ELSE 0 END AS s_fr
             |  FROM (SELECT doc_id,
             |          list_filter(regexp_split_to_array(lower(text), '\s+'), t -> length(t) > 0) AS toks
             |        FROM documents) x) y
             |ORDER BY doc_id""".stripMargin)),

    "ta_lang_rollup" -> Q(
      (s, d) => T(s, d, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"),
          sum(length(col("text")).cast("long")).as("total_chars"))
        .orderBy(col("lang")),
      Some("""SELECT lang, count(*) AS n_docs,
             |  CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'), t -> length(t) > 0))) AS BIGINT) AS total_tokens,
             |  CAST(sum(length(text)) AS BIGINT) AS total_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // BPE-ish token count — match-counting formulation is RE2-safe, so the
    // DuckDB oracle computes the identical count
    "ta_bpe_tokens" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.bpeIshTokenCount(col("text")).as("n_bpe"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // capstone: the full curation pipeline in ONE declarative query —
    // scrub → length gate → exact-dedup (min-id survivor) → per-language
    // rollup. Every stage is also verified standalone; this entry pins the
    // composition end-to-end against the same chain in DuckDB.
    // End-to-end data-prep chain built from this round's operators: quality
    // gate (keep) → duplicate-span removal on the survivors → per-source
    // token-budget fill ranked by the CLEANED text's diversity. One
    // declarative plan: the gate fuses into the scans, span removal stays
    // join-light, and the budget is one partitioned window — no stage ever
    // materializes to the driver.
    "pipeline_dataprep" -> Q(
      (s, d) => {
        // stage 1: the SAME composite gate as ta_quality_gate / the
        // streaming twin — one implementation, three surfaces; the unused
        // metric columns are pruned by Catalyst since only `keep` is read
        val gated = TextAnalysis.qualityGate(
            T(s, d, "documents").select(col("doc_id"), col("source"), col("text")),
            "text")
          .filter(col("keep"))
          .select(col("doc_id"), col("source"), col("text"))
        val cleanedDocs = Dedup.removeSharedSpans(gated, "doc_id", "text",
            w = 20, minDf = 2)
          .join(gated.select(col("doc_id"), col("source")), Seq("doc_id"))
          .select(col("doc_id"), col("source"),
            (col("n_tokens") - col("n_removed")).as("kept_tokens"),
            coalesce(TextAnalysis.typeTokenRatio(col("clean_text")), lit(0.0))
              .as("__score"))
        graft.ops.Curation.tokenBudget(cleanedDocs, "doc_id", "source",
            col("kept_tokens"), col("__score"), budget = 300L)
          .select(col("doc_id"), col("source"), col("kept_tokens"),
            col("cum_weight"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, source, text,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS toks,
             |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> length(x) > 0) AS ltoks
             |  FROM documents),
             |gated AS (SELECT doc_id, source, toks FROM t
             |  WHERE len(toks) BETWEEN 20 AND 90
             |    AND (CASE WHEN len(toks) > 0
             |         THEN list_sum(list_transform(toks, x -> length(x))) * 1.0
             |              / len(toks) END) BETWEEN 3.8 AND 5.2
             |    AND (CASE WHEN len(toks) > 0
             |         THEN len(list_distinct(toks)) * 1.0 / len(toks) END) >= 0.45
             |    AND (CASE WHEN len(ltoks) > 0
             |         THEN len(list_filter(ltoks,
             |                x -> x IN ('the', 'a', 'of', 'and'))) * 1.0
             |              / len(ltoks) END) >= 0.02),
             |wins AS (SELECT doc_id, CAST(s AS INT) AS start,
             |    md5(array_to_string(toks[CAST(s AS INT):CAST(s + 19 AS INT)], ' ')) AS fp
             |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 20 + 2)) AS s
             |        FROM gated WHERE len(toks) >= 20)),
             |dup AS (SELECT fp FROM wins GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
             |cov AS (SELECT DISTINCT w.doc_id, CAST(p AS INT) AS pos
             |  FROM wins w JOIN dup USING (fp), unnest(range(w.start, w.start + 20)) AS u(p)),
             |tok AS (SELECT doc_id, CAST(p AS INT) AS pos, toks[CAST(p AS INT)] AS tok
             |  FROM gated, unnest(range(1, len(toks) + 1)) AS u(p)),
             |kept AS (SELECT tok.doc_id, tok.pos, tok.tok
             |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
             |  WHERE cov.doc_id IS NULL),
             |agg AS (SELECT doc_id, count(*) AS n_kept,
             |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
             |  FROM kept GROUP BY 1),
             |clean AS (SELECT g.doc_id, g.source,
             |    CAST(coalesce(a.n_kept, 0) AS BIGINT) AS kept_tokens,
             |    coalesce(a.clean_text, '') AS clean_text
             |  FROM gated g LEFT JOIN agg a USING (doc_id)),
             |scored AS (SELECT doc_id, source, kept_tokens,
             |    coalesce(CASE WHEN len(ct) > 0
             |                  THEN len(list_distinct(ct)) * 1.0 / len(ct) END, 0) AS score
             |  FROM (SELECT clean.*, list_filter(regexp_split_to_array(clean_text, '\s+'),
             |                x -> length(x) > 0) AS ct FROM clean)),
             |runsum AS (SELECT doc_id, source, kept_tokens,
             |    CAST(sum(kept_tokens) OVER (PARTITION BY source
             |      ORDER BY score DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_weight
             |  FROM scored)
             |SELECT doc_id, source, kept_tokens, cum_weight
             |FROM runsum WHERE cum_weight <= 300 ORDER BY doc_id""".stripMargin)),

    "pipeline_curation" -> Q(
      (s, d) => {
        val cleaned = T(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            graft.text.TextAnalysis.scrub(col("text")).as("clean"))
          .filter(length(col("clean")) > 50)
        val survivors = cleaned
          .groupBy(col("clean"))
          .agg(min(col("doc_id")).as("doc_id"))
        survivors.join(cleaned, Seq("doc_id", "clean"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("clean"))).as("total_chars"))
          .orderBy(col("lang"))
      },
      Some("""WITH cleaned AS (
             |  SELECT doc_id, lang,
             |    trim(regexp_replace(
             |      regexp_replace(
             |        regexp_replace(
             |          regexp_replace(text, '<[^>]*>', '', 'g'),
             |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |        'https?://[^\s]+', '[URL]', 'g'),
             |      '\s+', ' ', 'g')) AS clean
             |  FROM documents),
             |gated AS (SELECT * FROM cleaned WHERE length(clean) > 50),
             |survivors AS (SELECT clean, min(doc_id) AS doc_id FROM gated GROUP BY clean)
             |SELECT lang, count(*) AS n_docs, CAST(sum(length(clean)) AS BIGINT) AS total_chars
             |FROM survivors JOIN gated USING (doc_id, clean)
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // corpus scrubbing: strip HTML → redact emails/URLs → normalize ws.
    // Synthetic dirt is injected from columns so the transform is provably
    // non-trivial; RE2-compatible patterns make the DuckDB oracle exact.
    // PII governance: deterministic synthetic PII appended per doc (both
    // engines build the identical text) so redaction/profiling run against
    // real pattern shapes, never a vacuous clean corpus
    "gov_pii_redact" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          concat(col("text"),
            lit(" Contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com or +1 (555) 010-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
            lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
            lit(".7, card 4111 1111 1111 1111.")).as("t"))
        .select(col("doc_id"),
          md5(graft.text.Governance.redactPii(col("t"))).as("h"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, md5(
             |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             |    text || ' Contact user' || doc_id::VARCHAR
             |         || '@mail.example.com or +1 (555) 010-'
             |         || lpad((doc_id % 10000)::VARCHAR, 4, '0')
             |         || ' from 10.0.' || (doc_id % 256)::VARCHAR
             |         || '.7, card 4111 1111 1111 1111.',
             |    '\b(?:\d[ -]?){12,15}\d\b', '[CARD]', 'g'),
             |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g'),
             |    '\+?\d[\d().\s-]{6,}\d', '[PHONE]', 'g'),
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |    'https?://[^\s]+', '[URL]', 'g')) AS h
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "gov_pii_profile" -> Q(
      (s, d) => graft.text.Governance.piiProfile(
          T(s, d, "documents")
            .select(col("doc_id"),
              concat(col("text"),
                lit(" Contact user"), col("doc_id").cast("string"),
                lit("@mail.example.com or +1 (555) 010-"),
                lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
                lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
                lit(".7, card 4111 1111 1111 1111.")).as("t")),
          "doc_id", "t")
        .agg(sum(col("n_cards")).cast("long").as("cards"),
          sum(col("n_ips")).cast("long").as("ips"),
          sum(col("n_phones")).cast("long").as("phones"),
          sum(col("n_emails")).cast("long").as("emails"),
          sum(col("n_urls")).cast("long").as("urls"),
          count(lit(1)).as("n_docs")),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    text || ' Contact user' || doc_id::VARCHAR
             |         || '@mail.example.com or +1 (555) 010-'
             |         || lpad((doc_id % 10000)::VARCHAR, 4, '0')
             |         || ' from 10.0.' || (doc_id % 256)::VARCHAR
             |         || '.7, card 4111 1111 1111 1111.' AS t
             |  FROM documents),
             |staged AS (
             |  SELECT t,
             |    regexp_replace(t, '\b(?:\d[ -]?){12,15}\d\b', '[CARD]', 'g') AS after_cards
             |  FROM t),
             |staged2 AS (
             |  SELECT t, after_cards,
             |    regexp_replace(after_cards, '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g') AS after_ips
             |  FROM staged)
             |SELECT
             |  CAST(sum(length(regexp_extract_all(t, '\b(?:\d[ -]?){12,15}\d\b'))) AS BIGINT) AS cards,
             |  CAST(sum(length(regexp_extract_all(after_cards, '\b(?:\d{1,3}\.){3}\d{1,3}\b'))) AS BIGINT) AS ips,
             |  CAST(sum(length(regexp_extract_all(after_ips, '\+?\d[\d().\s-]{6,}\d'))) AS BIGINT) AS phones,
             |  CAST(sum(length(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS emails,
             |  CAST(sum(length(regexp_extract_all(t, 'https?://[^\s]+'))) AS BIGINT) AS urls,
             |  count(*) AS n_docs
             |FROM staged2""".stripMargin)),

    // Keyed pseudonymization survives joins/group-bys: per-customer order
    // counts keyed by the anonymized name match the cleartext grouping
    "gov_pseudonymize" -> Q(
      (s, d) => T(s, d, "orders")
        .join(T(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(graft.text.Governance.pseudonymize(col("c_name"), "k1").as("p"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("p"))
        .limit(20),
      Some("""SELECT substr(md5('k1|' || c_name), 1, 16) AS p, count(*) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY n_orders DESC, p LIMIT 20""".stripMargin)),

    // BM25 keyword retrieval over documents — the lexical twin of v3 knn.
    // Scores round to 6 decimals BEFORE ranking in both engines, so
    // double-sum jitter can't reorder the boundary
    "ta_bm25_search" -> Q(
      (s, d) => graft.text.Bm25.search(
        T(s, d, "documents"), "doc_id", "text",
        queryTerms = Seq("join", "vector", "shard"), k = 15),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |stats AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
             |corpus AS (SELECT count(*) AS n_docs, avg(len) AS avg_len FROM stats),
             |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
             |       WHERE tok IN ('join', 'vector', 'shard') GROUP BY 1, 2),
             |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
             |scores AS (
             |  SELECT doc_id,
             |    sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             |        * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / avg_len))) AS s
             |  FROM tf JOIN dfreq USING (tok) JOIN stats USING (doc_id), corpus
             |  GROUP BY doc_id)
             |SELECT doc_id, round(s, 6) AS score FROM scores
             |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin)),

    // Index-backed BM25: build the bucket-partitioned inverted index, then
    // answer the same query reading ONLY the query terms' partitions.
    // Bit-identical to the direct path → same oracle SQL
    "ta_bm25_index" -> Q(
      (s, d) => {
        val root = FixtureRoot.fresh("bm25")
        graft.text.Bm25.buildIndex(T(s, d, "documents"), "doc_id", "text",
          root.toString + "/idx")
        graft.text.Bm25.searchIndex(s, root.toString + "/idx",
          queryTerms = Seq("join", "vector", "shard"), k = 15)
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |stats AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
             |corpus AS (SELECT count(*) AS n_docs, avg(len) AS avg_len FROM stats),
             |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
             |       WHERE tok IN ('join', 'vector', 'shard') GROUP BY 1, 2),
             |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
             |scores AS (
             |  SELECT doc_id,
             |    sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             |        * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / avg_len))) AS s
             |  FROM tf JOIN dfreq USING (tok) JOIN stats USING (doc_id), corpus
             |  GROUP BY doc_id)
             |SELECT doc_id, round(s, 6) AS score FROM scores
             |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin)),

    // Token-budget sequence packing (concat-and-chunk): deterministic md5
    // order, two-phase distributed running sum, pack = floor(start/budget).
    // The oracle recomputes the same order and offsets with one global
    // window — small-engine semantics, big-engine plan
    "cu_pack_sequences" -> Q(
      (s, d) => graft.ops.Curation.packSequences(
        T(s, d, "documents").select(col("doc_id"),
          graft.text.TextAnalysis.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budget = 4096L),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
             |                         x -> length(x) > 0)) AS BIGINT) AS n_tokens,
             |    md5(CAST(doc_id AS VARCHAR)) AS k
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, n_tokens,
             |    CAST(sum(n_tokens) OVER (ORDER BY k, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      - n_tokens AS BIGINT) AS start_offset
             |  FROM t)
             |SELECT doc_id, n_tokens, start_offset,
             |  CAST(floor(start_offset / 4096.0) AS BIGINT) AS pack_id
             |FROM c""".stripMargin)),

    // boilerplate detection: word bigrams shared by >=10 distinct docs of
    // the same source are crawl debris; per-doc contamination ratio
    "ta_boilerplate" -> Q(
      (s, d) => graft.text.TextAnalysis.boilerplate(
        T(s, d, "documents"), "doc_id", "text", "source", n = 2, minDocs = 10),
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS toks
             |  FROM documents),
             |g AS (SELECT doc_id, source,
             |    unnest(list_transform(range(1, CAST(greatest(len(toks) - 1, 0) AS INT) + 1),
             |           i -> array_to_string(toks[i:i+1], ' '))) AS gram
             |  FROM t),
             |b AS (SELECT source, gram
             |      FROM (SELECT DISTINCT doc_id, source, gram FROM g) dg
             |      GROUP BY source, gram HAVING count(*) >= 10),
             |pd AS (SELECT g.doc_id, count(*) AS n_boiler
             |       FROM g JOIN b USING (source, gram) GROUP BY 1),
             |base AS (SELECT doc_id,
             |           CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_grams FROM t)
             |SELECT base.doc_id, n_grams,
             |  coalesce(pd.n_boiler, 0) AS n_boiler,
             |  coalesce(round(pd.n_boiler * 1.0 / nullif(n_grams, 0), 6), 0.0) AS boiler_ratio
             |FROM base LEFT JOIN pd ON base.doc_id = pd.doc_id""".stripMargin)),

    // CAPSTONE: the modern pretraining data pipeline composed end-to-end
    // from this round's operators — quality gates (entropy + unigram LM)
    // → exact dedup survivors → temperature rebalance → train/val/test
    // split → per-(split, source) doc and token counts. Every stage's
    // oracle block was proven individually; this checks the COMPOSITION
    // (gate thresholds compare round-6 values, so the cascade is stable)
    "pipeline_pretraining" -> Q(
      (s, d) => {
        import graft.ops.Curation
        import graft.text.TextAnalysis
        val docs = T(s, d, "documents")
        // tokenize ONCE (round-11): the fused tokenStats pass feeds the
        // entropy gate, the LM gate, AND the final token-count aggregate
        // (n_tokens rides the pipeline as a column) — the previous
        // three-explode composition was the battery's worst scale slope
        val stats = TextAnalysis.tokenStats(docs, "doc_id", "text")
        // persist the gated corpus: four downstream consumers (survivor
        // keep-set, survivor join, mix rates, final agg) re-reference this
        // frame, and without a stage boundary each re-derivation re-runs
        // the tokenize pass (column pruning differentiates the subtrees,
        // so exchange reuse cannot dedup them) — the materialization is
        // the fan-out boundary a production pipeline would write anyway
        val gated = docs.join(stats, "doc_id")
          .filter(col("entropy") >= 2.8 && col("avg_logp") >= -3.5)
          .drop("entropy", "avg_logp")
          .persist()
        val surv = Dedup.exactSurvivors(gated, "doc_id", "text")
        val mixed = Curation.temperatureMix(surv, "doc_id", "source",
            tau = 0.5, targetFrac = 0.5)
          .filter(col("__keep")).drop("__keep", "__keep_rate")
        Curation.splitAssign(mixed, "doc_id",
            Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)))
          .groupBy(col("split"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("n_tokens"))
          .orderBy(col("split"), col("source"))
      },
      Some(s"""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
             |ent AS (SELECT doc_id, round(ln(CAST(sum(c) AS BIGINT))
             |          - sum(c * ln(c)) / CAST(sum(c) AS BIGINT), 6) AS entropy
             |        FROM tc GROUP BY 1),
             |vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
             |lm AS (SELECT doc_id, round(avg(ln(cnt)) - ln(total), 6) AS avg_logp
             |       FROM toks JOIN vocab USING (tok), tot GROUP BY doc_id, total),
             |gated AS (SELECT d.* FROM documents d
             |          JOIN ent USING (doc_id) JOIN lm USING (doc_id)
             |          WHERE entropy >= 2.8 AND avg_logp >= -3.5),
             |surv AS (SELECT g.* FROM gated g
             |         JOIN (SELECT text, min(doc_id) AS doc_id
             |               FROM gated GROUP BY text) k ON g.doc_id = k.doc_id),
             |c AS (SELECT source, count(*) AS n FROM surv GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS total_n, sum(pow(n, 0.5)) AS z FROM c),
             |r AS (SELECT source, round(least(1.0,
             |        0.5 * total_n * pow(n, 0.5) / z / n), 6) AS keep_rate FROM c, t),
             |mixed AS (SELECT s.* FROM surv s JOIN r USING (source)
             |          WHERE CAST('0x' || substr(md5('temp|' || s.doc_id), 1, 15) AS BIGINT)
             |            % 10000 / 10000.0 < r.keep_rate),
             |sp AS (SELECT *, CASE WHEN u < 0.9 THEN 'train'
             |                      WHEN u < 0.95 THEN 'val'
             |                      ELSE 'test' END AS split
             |       FROM (SELECT m.*, CAST('0x' || substr(md5('split|' || doc_id), 1, 15) AS BIGINT)
             |               % 10000 / 10000.0 AS u FROM mixed m))
             |SELECT split, source, count(*) AS n_docs,
             |  CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
             |                           x -> length(x) > 0))) AS BIGINT) AS n_tokens
             |FROM sp GROUP BY 1, 2 ORDER BY split, source""".stripMargin)),

    // CAPSTONE (near-dup-aware): the pretraining pipeline with its dedup
    // stage upgraded from exact-text to the full near-dup reduction — the
    // dedup a real corpus-curation run uses (minhash → banded LSH pairs →
    // connected components → longest-text survivor per cluster), chained
    // BEFORE the temperature mix and split. Same gates and downstream
    // stages as pipeline_pretraining, so diffing the two shows exactly what
    // near-dup awareness removes. Composition of proven pieces: LSH join
    // only on (band, bucket) — never all-pairs — and min-label components
    // with per-round lineage truncation; scale argument is the sum of the
    // stages' individual ones (SCALE.md dedup section). Oracle replays the
    // whole cascade, closing the identical md5 LSH pairs with the
    // recursive-CTE pattern proven in dd_cluster_survivors. The gate and
    // final token counts all derive from ONE fused tokenStats pass
    // (round-11).
    "pipeline_neardup_pretraining" -> Q(
      (s, d) => {
        import graft.ops.Curation
        import graft.text.TextAnalysis
        val docs = T(s, d, "documents")
        // tokenize-once gate + n_tokens carried as a column (round-11),
        // same rationale as pipeline_pretraining
        val stats = TextAnalysis.tokenStats(docs, "doc_id", "text")
        // persisted fan-out boundary, same rationale as pipeline_pretraining
        val gated = docs.join(stats, "doc_id")
          .filter(col("entropy") >= 2.8 && col("avg_logp") >= -3.5)
          .drop("entropy", "avg_logp")
          .persist()
        val sig = Dedup.minhashSignature(gated, "doc_id", "text", 5, 4)
        val pairs = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 4, bands = 2)
        // min-label components, KEPT after a round-11 A/B vs the O(log d)
        // star contraction: on this capstone's clique-like near-dup graph
        // min-label's 1-hop-min seed converges in ~2 rounds while stars
        // pays two grouped phases per alternation — measured 19.7 s vs
        // 22.2 s at sf0.1. Stars (dd_cluster_stars) stays the deep-diameter
        // scale path; swap it in when components are chain-shaped.
        val labels = Dedup.connectedComponents(
          pairs, gated.select(col("doc_id")), "doc_id")
        val surv = Dedup.dedupByCluster(gated, labels, "doc_id", length(col("text")))
          .drop("cluster")
        val mixed = Curation.temperatureMix(surv, "doc_id", "source",
            tau = 0.5, targetFrac = 0.5)
          .filter(col("__keep")).drop("__keep", "__keep_rate")
        Curation.splitAssign(mixed, "doc_id",
            Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)))
          .groupBy(col("split"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("n_tokens"))
          .orderBy(col("split"), col("source"))
      },
      Some(s"""WITH RECURSIVE toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
             |ent AS (SELECT doc_id, round(ln(CAST(sum(c) AS BIGINT))
             |          - sum(c * ln(c)) / CAST(sum(c) AS BIGINT), 6) AS entropy
             |        FROM tc GROUP BY 1),
             |vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
             |lm AS (SELECT doc_id, round(avg(ln(cnt)) - ln(total), 6) AS avg_logp
             |       FROM toks JOIN vocab USING (tok), tot GROUP BY doc_id, total),
             |gated AS (SELECT d.* FROM documents d
             |          JOIN ent USING (doc_id) JOIN lm USING (doc_id)
             |          WHERE entropy >= 2.8 AND avg_logp >= -3.5),
             |sh AS (SELECT DISTINCT doc_id, substr(text, CAST(s + 1 AS INT), 5) AS shingle
             |  FROM (SELECT doc_id, text,
             |          unnest(range(0, greatest(length(text) - 5, 0) + 1)) AS s
             |        FROM gated) t),
             |sig AS (SELECT doc_id,
             |    min(md5('0|' || shingle)) AS h0, min(md5('1|' || shingle)) AS h1,
             |    min(md5('2|' || shingle)) AS h2, min(md5('3|' || shingle)) AS h3
             |  FROM sh GROUP BY doc_id),
             |b AS (SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bucket FROM sig
             |      UNION ALL
             |      SELECT doc_id, 1 AS band, md5(h2 || '|' || h3) AS bucket FROM sig),
             |pairs AS (SELECT DISTINCT a.doc_id AS id_a, c2.doc_id AS id_b
             |  FROM b a JOIN b c2 ON a.band = c2.band AND a.bucket = c2.bucket
             |    AND a.doc_id < c2.doc_id),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION SELECT id_b, id_a FROM pairs),
             |reach AS (SELECT doc_id AS id, doc_id AS m FROM gated
             |      UNION
             |      SELECT e.src, reach.m FROM edges e JOIN reach ON e.dst = reach.id),
             |lbl AS (SELECT id AS doc_id, min(m) AS cluster FROM reach GROUP BY id),
             |ranked AS (SELECT g.doc_id, g.text, g.source,
             |    row_number() OVER (PARTITION BY l.cluster
             |                       ORDER BY length(g.text) DESC, g.doc_id) AS rn
             |  FROM gated g JOIN lbl l USING (doc_id)),
             |surv AS (SELECT doc_id, text, source FROM ranked WHERE rn = 1),
             |c AS (SELECT source, count(*) AS n FROM surv GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS total_n, sum(pow(n, 0.5)) AS z FROM c),
             |kr AS (SELECT source, round(least(1.0,
             |        0.5 * total_n * pow(n, 0.5) / z / n), 6) AS keep_rate FROM c, t),
             |mixed AS (SELECT s.* FROM surv s JOIN kr USING (source)
             |          WHERE CAST('0x' || substr(md5('temp|' || s.doc_id), 1, 15) AS BIGINT)
             |            % 10000 / 10000.0 < kr.keep_rate),
             |sp AS (SELECT *, CASE WHEN u < 0.9 THEN 'train'
             |                      WHEN u < 0.95 THEN 'val'
             |                      ELSE 'test' END AS split
             |       FROM (SELECT m.*, CAST('0x' || substr(md5('split|' || doc_id), 1, 15) AS BIGINT)
             |               % 10000 / 10000.0 AS u FROM mixed m))
             |SELECT split, source, count(*) AS n_docs,
             |  CAST(sum(len(list_filter(regexp_split_to_array(text, '\\s+'),
             |                           x -> length(x) > 0))) AS BIGINT) AS n_tokens
             |FROM sp GROUP BY 1, 2 ORDER BY split, source""".stripMargin)),

    // token-distribution entropy per doc: ln n - sum(c ln c)/n —
    // repetitive/templated text scores low
    "ta_entropy" -> Q(
      (s, d) => graft.text.TextAnalysis.tokenEntropy(
        T(s, d, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
             |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |        sum(c * ln(c)) AS s FROM tc GROUP BY 1)
             |SELECT doc_id, n_tokens,
             |  round(ln(n_tokens) - s / n_tokens, 6) AS entropy
             |FROM a""".stripMargin)),

    // winsorization: clip the value tails at exact p05/p95 percentiles,
    // cutpoints as broadcast literals, clip as a scan-level scalar
    "dq_winsorize" -> Q(
      (s, d) => graft.quality.DataQuality.winsorize(
          TestData.events(s, d), "value", pLow = 0.05, pHigh = 0.95)
        .select(col("event_id"), col("value"), col("winsorized")),
      Some("""WITH q AS (SELECT quantile_cont(value, 0.05) AS lo,
             |                  quantile_cont(value, 0.95) AS hi FROM events)
             |SELECT event_id, value,
             |  round(greatest(least(value, hi), lo), 6) AS winsorized
             |FROM events, q""".stripMargin)),

    // unigram-LM quality score (in-engine KenLM-perplexity stand-in):
    // avg token log-probability under corpus-trained frequencies
    "ta_unigram_lm" -> Q(
      (s, d) => graft.text.TextAnalysis.unigramLmScore(
        T(s, d, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
             |s AS (SELECT doc_id, count(*) AS n_tokens, avg(ln(cnt)) AS a
             |      FROM toks JOIN vocab USING (tok) GROUP BY 1)
             |SELECT doc_id, n_tokens, round(a - ln(total), 6) AS avg_logp
             |FROM s, tot""".stripMargin)),

    // Flesch reading-ease (round-11): the classic readability gate as one
    // codegen'd scalar — vowel-group syllables, [.!?]-run sentences, both
    // RE2-safe so the oracle computes the identical arithmetic
    "ta_readability" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          graft.text.TextAnalysis.tokenCount(col("text")).as("n_words"),
          graft.text.TextAnalysis.readability(col("text")).as("flesch"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
             |                       t -> length(t) > 0)) AS INT) AS n_words,
             |  CASE WHEN len(list_filter(regexp_split_to_array(text, '\s+'),
             |                            t -> length(t) > 0)) > 0 THEN
             |    round(206.835
             |      - 1.015 * len(list_filter(regexp_split_to_array(text, '\s+'),
             |                                t -> length(t) > 0))
             |        / greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
             |      - 84.6 * greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
             |        / len(list_filter(regexp_split_to_array(text, '\s+'),
             |                          t -> length(t) > 0)), 6)
             |  END AS flesch
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // fused token statistics (round-11): n_tokens + entropy + unigram-LM
    // log-prob from ONE tokenize/explode pass — the pretraining gate's
    // plan, pinned standalone so the fusion's parity with the separate
    // ta_entropy / ta_unigram_lm operators is oracle-checked directly
    "ta_token_stats" -> Q(
      (s, d) => graft.text.TextAnalysis.tokenStats(
        T(s, d, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
             |vocab AS (SELECT tok, CAST(sum(c) AS BIGINT) AS cnt FROM tc GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
             |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |        sum(c * ln(c)) AS s, sum(c * ln(cnt)) AS l
             |      FROM tc JOIN vocab USING (tok) GROUP BY 1)
             |SELECT doc_id, n_tokens,
             |  round(ln(n_tokens) - s / n_tokens, 6) AS entropy,
             |  round(l / n_tokens - ln(total), 6) AS avg_logp
             |FROM a, tot""".stripMargin)),

    // TF-IDF keyword extraction: top-5 terms per doc, rounded-then-ranked
    // so the window boundary is jitter-proof in both engines
    "ta_keywords" -> Q(
      (s, d) => graft.text.TextAnalysis.keywords(
        T(s, d, "documents"), "doc_id", "text", k = 5),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
             |wd AS (SELECT doc_id, term, tf,
             |         count(*) OVER (PARTITION BY term) AS df FROM tf),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |s AS (SELECT doc_id, term,
             |        round(tf * ln(n_docs / df), 6) AS score,
             |        row_number() OVER (PARTITION BY doc_id
             |          ORDER BY round(tf * ln(n_docs / df), 6) DESC, term) AS rank
             |      FROM wd, n)
             |SELECT doc_id, term, score, CAST(rank AS INT) AS rank
             |FROM s WHERE rank <= 5""".stripMargin)),

    // BPE tokenizer training: distributed word-freq pass + deterministic
    // driver merge loop. Hash oracle: the merge loop unrolled into
    // materialized chained CTEs (the g3_pagerank pattern) — each round
    // recomputes pair counts, picks best by (count desc, pair asc), and
    // replays the greedy left-to-right merge via islands-parity positions
    // (a run of k equal symbols merges at even offsets = floor(k/2) pairs,
    // exactly the Scala loop's overlap rule); pinned also in BpeSpec.
    "ta_bpe_train" -> Q(
      (s, d) => {
        val model = graft.text.Bpe.train(T(s, d, "documents"), "text", numMerges = 30)
        import s.implicits._
        model.merges.zipWithIndex
          .map { case ((a, b), r) => (r, a, b) }
          .toDF("rank", "left", "right")
          .orderBy(col("rank"))
      },
      Some(bpeTrainOracleSql(numMerges = 30, topWords = 50000))),

    "ta_scrub" -> Q(
      (s, d) => T(s, d, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          TextAnalysis.scrub(concat(
            lit("<p>"), col("text"), lit("</p> contact: user"),
            col("doc_id").cast("string"),
            lit("@example.com  see https://example.org/d/"),
            col("doc_id").cast("string"))).as("clean"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  trim(regexp_replace(
             |    regexp_replace(
             |      regexp_replace(
             |        regexp_replace(
             |          '<p>' || text || '</p> contact: user' || doc_id ||
             |          '@example.com  see https://example.org/d/' || doc_id,
             |          '<[^>]*>', '', 'g'),
             |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             |      'https?://[^\s]+', '[URL]', 'g'),
             |    '\s+', ' ', 'g')) AS clean
             |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin))
  )

  private def scalarDefs: Seq[(String, Q)] = Seq(

    "f4_enrichment_template" -> Q(
      (s, d) => TestData.events(s, d)
        .select(col("event_id"),
          concat(lit("Original query: "), col("event_type"),
            lit("\n\nAdditional context:\n"),
            coalesce(get_json_object(col("props"), "$.missing"),
              lit("No specific preference"))).as("enriched"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  'Original query: ' || event_type || chr(10) || chr(10) ||
             |  'Additional context:' || chr(10) ||
             |  coalesce(json_extract_string(props, '$.missing'), 'No specific preference') AS enriched
             |FROM events ORDER BY event_id""".stripMargin)),

    "f8_iso_format" -> Q(
      (s, d) => TestData.events(s, d)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss").as("iso_ts"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S') AS iso_ts
             |FROM events ORDER BY event_id""".stripMargin)),

    "f14_csv_parse" -> Q(
      (s, d) => T(s, d, "documents")
        .withColumn("arr", GraftFunctions.parseCsvList(
          concat(col("source"), lit(" , "), col("lang"))))
        .select(col("doc_id"),
          element_at(col("arr"), 1).as("first"),
          element_at(col("arr"), 2).as("second"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  list_transform(str_split(source || ' , ' || lang, ','), t -> trim(t))[1] AS first,
             |  list_transform(str_split(source || ' , ' || lang, ','), t -> trim(t))[2] AS second
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "f15_aspect_ratio" -> Q(
      (s, d) => TestData.events(s, d)
        .select(col("event_id"),
          floor(col("value") * 2 / 3).cast("int").as("scaled_height"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, CAST(floor(value * 2 / 3) AS INT) AS scaled_height
             |FROM events ORDER BY event_id""".stripMargin)),

    "s3_point_lookup" -> Q(
      (s, d) => T(s, d, "customer")
        .filter(col("c_custkey") === 42L)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .limit(1),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE c_custkey = 42 LIMIT 1""".stripMargin)),

    "f3_format_context" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("Title: Doc "), col("doc_id").cast("string"), lit(NL),
            lit("Summary: "), substring(col("text"), 1, 20), lit(NL),
            lit("Content: "), substring(col("text"), 1, 40)).as("block"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  'Title: Doc ' || doc_id || chr(10) ||
             |  'Summary: ' || substr(text, 1, 20) || chr(10) ||
             |  'Content: ' || substr(text, 1, 40) AS block
             |FROM documents ORDER BY doc_id""".stripMargin)),

    "f5_search_input_format" -> Q(
      (s, d) => TestData.events(s, d)
        .select(col("event_id"),
          GraftFunctions.formatSearchInput(col("event_type"),
            concat(lit("user "), col("user_id").cast("string"))).as("search_input"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |  'Search term: ' || event_type || chr(10) || 'Reason for searching: user ' || user_id AS search_input
             |FROM events ORDER BY event_id""".stripMargin)),

    "f11_contains_filter" -> Q(
      (s, d) => T(s, d, "documents")
        .filter(GraftFunctions.containsAnyIgnoreCase(col("text"), Seq("spark", "merge")))
        .select(col("doc_id"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id FROM documents
             |WHERE contains(lower(text), 'spark') OR contains(lower(text), 'merge')
             |ORDER BY doc_id""".stripMargin)),

    "a3_progress_counters" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_total"),
          count(when(col("event_type") === "purchase", 1)).as("n_done"))
        .select(col("user_id"), col("n_total"), col("n_done"),
          round(col("n_done") * 100.0 / col("n_total"), 6).as("pct_done"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, n_total, n_done, round(n_done * 100.0 / n_total, 6) AS pct_done
             |FROM (SELECT user_id, count(*) AS n_total,
             |        count(*) FILTER (WHERE event_type = 'purchase') AS n_done
             |      FROM events GROUP BY user_id) t
             |ORDER BY user_id""".stripMargin)),

    // ── round 4: SCD2, sampling, batching, hybrid retrieval, drift, URLs ──

    // SCD2 dimension build from a change log: collapse no-op rows, then
    // half-open validity intervals via lead — both windows share one
    // shuffle on the entity key (plan pinned in PlanAuditSpec)
    "x12_scd2" -> Q(
      (s, d) => Relational.scd2(
          TestData.events(s, d)
            .select(col("event_id"), col("user_id"), col("event_type"),
              unix_millis(col("ts")).as("ms")),
          "user_id", "ms", Seq("event_type"), tieBreak = Seq(col("event_id")))
        .select(col("user_id"), col("event_type"),
          col("valid_from").as("valid_from_ms"), col("valid_to").as("valid_to_ms"),
          col("is_current"))
        .orderBy(col("user_id"), col("valid_from_ms"), col("event_type")),
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
             |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
             |c AS (SELECT *,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev,
             |    lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev_ms
             |  FROM e),
             |-- prev_ms IS NULL keeps each key's FIRST row even when its
             |-- tracked attribute is NULL: Spark's lag-struct is null only
             |-- for the first row, but NULL-vs-NULL under IS DISTINCT FROM
             |-- is "not distinct" and would drop it (ms is non-null)
             |ch AS (SELECT user_id, event_type, ms, event_id FROM c
             |       WHERE prev_ms IS NULL OR prev IS DISTINCT FROM event_type)
             |SELECT user_id, event_type, ms AS valid_from_ms,
             |  lead(ms) OVER w AS valid_to_ms,
             |  lead(ms) OVER w IS NULL AS is_current
             |FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
             |ORDER BY user_id, valid_from_ms, event_type""".stripMargin)),

    // weighted sampling without replacement (A-ES): global top-k on the
    // deterministic key, TakeOrderedAndProject — no full sort
    "cu_weighted_sample" -> Q(
      (s, d) => graft.ops.Curation.weightedSample(
          T(s, d, "documents").select(col("doc_id"), col("n_chars")),
          "doc_id", col("n_chars"), k = 50, salt = "ws1")
        .orderBy(col("samp_key"), col("doc_id")),
      Some("""WITH u AS (SELECT doc_id, n_chars,
             |    greatest(CAST(CAST('0x' || substr(md5('ws1|' || doc_id), 1, 15) AS BIGINT) % 10000 AS DOUBLE) / 10000.0, 0.0001) AS uu
             |  FROM documents)
             |SELECT doc_id, n_chars, round(-ln(uu) / n_chars, 9) AS samp_key
             |FROM u ORDER BY samp_key, doc_id LIMIT 50""".stripMargin)),

    // length-bucketed batch assignment: quantile buckets via cutpoints (no
    // global sort), md5-shuffled within bucket, cut every 16 rows
    "cu_length_batches" -> Q(
      (s, d) => graft.ops.Curation.lengthBatches(
          T(s, d, "documents"), "doc_id", col("n_chars"),
          nBuckets = 4, batchSize = 16, salt = "lb1")
        .orderBy(col("batch_id"), col("pos_in_batch")),
      Some("""WITH c AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS cuts FROM documents),
             |b AS (SELECT doc_id, n_chars,
             |        1 + CAST(n_chars > cuts[1] AS INT) + CAST(n_chars > cuts[2] AS INT)
             |          + CAST(n_chars > cuts[3] AS INT) AS bucket
             |      FROM documents, c),
             |r AS (SELECT *, row_number() OVER (PARTITION BY bucket
             |        ORDER BY md5('lb1|' || doc_id), doc_id) - 1 AS rn FROM b)
             |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_tokens, bucket,
             |  CAST(bucket * 1000000 + rn // 16 AS BIGINT) AS batch_id,
             |  CAST(rn % 16 AS INT) AS pos_in_batch
             |FROM r ORDER BY batch_id, pos_in_batch""".stripMargin)),

    // hybrid retrieval: BM25 top-20 ∪ cosine top-20 → reciprocal-rank
    // fusion (k0=60); both lists are pre-reduced so fusion joins k rows
    "v6_hybrid_rrf" -> Q(
      (s, d) => {
        val lex = graft.text.Bm25.search(T(s, d, "documents"), "doc_id", "text",
          queryTerms = Seq("join", "vector", "shard"), k = 20)
        val vec = Rag.knn(TestData.embeddings(s, d).filter(col("vec_id") =!= 0),
            "vec_id", "embedding", queryVec(s, d), k = 20, minScore = 0.0)
          .select(col("vec_id").as("doc_id"), round(col("score"), 6).as("score"))
        Rag.rrfFuse(Seq(lex, vec), "doc_id", "score", k0 = 60, topK = 10)
          .orderBy(col("rrf").desc, col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |stats AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY 1),
             |corpus AS (SELECT count(*) AS n_docs, avg(len) AS avg_len FROM stats),
             |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
             |       WHERE tok IN ('join', 'vector', 'shard') GROUP BY 1, 2),
             |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
             |sc AS (SELECT doc_id,
             |    round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             |        * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / avg_len))), 6) AS score
             |  FROM tf JOIN dfreq USING (tok) JOIN stats USING (doc_id), corpus
             |  GROUP BY doc_id),
             |bmtop AS (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 20),
             |bm AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rb FROM bmtop),
             |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
             |pr AS (SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(qv.q)::DOUBLE AS y
             |       FROM embeddings e, qv WHERE e.vec_id <> 0),
             |cs AS (SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS s
             |       FROM pr GROUP BY vec_id),
             |vtop AS (SELECT vec_id AS doc_id, round(s, 6) AS score FROM cs
             |         ORDER BY s DESC, vec_id LIMIT 20),
             |vv AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rv FROM vtop),
             |f AS (SELECT coalesce(bm.doc_id, vv.doc_id) AS doc_id,
             |        round(coalesce(1.0/(60+rb), 0) + coalesce(1.0/(60+rv), 0), 9) AS rrf
             |      FROM bm FULL OUTER JOIN vv ON bm.doc_id = vv.doc_id)
             |SELECT doc_id, rrf FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin)),

    // per-label embedding centroids in long form: decimal-exact dimension
    // sums (order-independent partials), double mean on the way out
    "v7_centroids" -> Q(
      (s, d) => TestData.embeddings(s, d).filter(col("vec_id") =!= 0)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim"))
        .agg((sum(col("x").cast("decimal(28,12)")).cast("double") / count(lit(1))).as("m"))
        .select(col("label"), col("dim"), round(col("m"), 6).as("mean"))
        .orderBy(col("label"), col("dim")),
      Some("""SELECT label, i - 1 AS dim,
             |  round(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS mean
             |FROM (SELECT label, unnest(embedding)::DOUBLE AS x,
             |        generate_subscripts(embedding, 1) AS i
             |      FROM embeddings WHERE vec_id <> 0) t
             |GROUP BY label, i ORDER BY label, dim""".stripMargin)),

    // PSI distribution drift between two event halves: reference-quantile
    // bins, add-half smoothing, per-bin (p_c − p_r)·ln(p_c/p_r)
    "dq_drift" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d).filter(col("value").isNotNull)
        graft.quality.DataQuality.psiDrift(
            ev.filter(col("event_id") % 2 === 0).select(col("value")),
            ev.filter(col("event_id") % 2 === 1).select(col("value")),
            "value", nBins = 10)
          .orderBy(col("bin"))
      },
      Some("""WITH ref AS (SELECT value FROM events WHERE value IS NOT NULL AND event_id % 2 = 0),
             |cur AS (SELECT value FROM events WHERE value IS NOT NULL AND event_id % 2 = 1),
             |c AS (SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts FROM ref),
             |rb AS (SELECT 1 + CAST(value > cuts[1] AS INT) + CAST(value > cuts[2] AS INT)
             |         + CAST(value > cuts[3] AS INT) + CAST(value > cuts[4] AS INT)
             |         + CAST(value > cuts[5] AS INT) + CAST(value > cuts[6] AS INT)
             |         + CAST(value > cuts[7] AS INT) + CAST(value > cuts[8] AS INT)
             |         + CAST(value > cuts[9] AS INT) AS bin FROM ref, c),
             |cb AS (SELECT 1 + CAST(value > cuts[1] AS INT) + CAST(value > cuts[2] AS INT)
             |         + CAST(value > cuts[3] AS INT) + CAST(value > cuts[4] AS INT)
             |         + CAST(value > cuts[5] AS INT) + CAST(value > cuts[6] AS INT)
             |         + CAST(value > cuts[7] AS INT) + CAST(value > cuts[8] AS INT)
             |         + CAST(value > cuts[9] AS INT) AS bin FROM cur, c),
             |rn AS (SELECT bin, count(*) AS n_ref FROM rb GROUP BY 1),
             |cn AS (SELECT bin, count(*) AS n_cur FROM cb GROUP BY 1),
             |spine AS (SELECT CAST(unnest(range(1, 11)) AS INT) AS bin),
             |j AS (SELECT bin, coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
             |      FROM spine LEFT JOIN rn USING (bin) LEFT JOIN cn USING (bin)),
             |t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
             |SELECT bin, n_ref, n_cur,
             |  round(((n_cur + 0.5)/(tc + 5.0) - (n_ref + 0.5)/(tr + 5.0))
             |        * ln(((n_cur + 0.5)/(tc + 5.0)) / ((n_ref + 0.5)/(tr + 5.0))), 9) AS psi_term
             |FROM j, t ORDER BY bin""".stripMargin)),

    // URL canonicalization → exact dedup: 500 messy aliases (case, default
    // port, tracking params, fragments, trailing slash) collapse to 25
    // canonical URLs; the whole chain is scan-fused scalar expressions
    "web_url_canon" -> Q(
      (s, d) => {
        val raw = T(s, d, "documents").select(col("doc_id"),
          concat(
            when(col("doc_id") % 2 === 0, lit("HTTPS://WWW.Example.COM:443"))
              .otherwise(lit("https://www.example.com")),
            lit("/docs/"), (col("doc_id") % 25).cast("string"),
            when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
            lit("?utm_source=feed&id="), (col("doc_id") % 25).cast("string"),
            when(col("doc_id") % 5 === 0, lit("&utm_campaign=x")).otherwise(lit("")),
            lit("#sec"), col("doc_id").cast("string")).as("url"))
        raw.select(col("doc_id"), graft.ops.Web.canonicalizeUrl(col("url")).as("canonical"))
          .groupBy(col("canonical"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
          .orderBy(col("canonical"))
      },
      Some("""WITH raw AS (SELECT doc_id,
             |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.Example.COM:443' ELSE 'https://www.example.com' END)
             |    || '/docs/' || (doc_id % 25)
             |    || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END)
             |    || '?utm_source=feed&id=' || (doc_id % 25)
             |    || (CASE WHEN doc_id % 5 = 0 THEN '&utm_campaign=x' ELSE '' END)
             |    || '#sec' || doc_id AS url FROM documents),
             |st AS (SELECT doc_id, regexp_replace(url, '#.*', '', 'g') AS u1 FROM raw),
             |au AS (SELECT doc_id, u1,
             |         regexp_extract(u1, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*') AS auth FROM st),
             |parts AS (SELECT doc_id,
             |    regexp_replace(regexp_replace(lower(auth),
             |      '^(http://[^/:]*):80$', '\1'), '^(https://[^/:]*):443$', '\1') AS a2,
             |    substr(u1, length(auth) + 1) AS rest FROM au),
             |clean AS (SELECT doc_id, a2,
             |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             |      rest, '([?&])(utm_[a-zA-Z0-9_]*|fbclid|gclid|ref)=[^&#]*', '\1', 'g'),
             |      '\?&+', '?', 'g'), '&&+', '&', 'g'), '[?&]+$', '', 'g') AS r2 FROM parts),
             |fin AS (SELECT doc_id,
             |    a2 || regexp_replace(regexp_replace(r2, '/\?', '?', 'g'), '/$', '', 'g') AS canonical
             |  FROM clean)
             |SELECT canonical, count(*) AS n, min(doc_id) AS first_doc
             |FROM fin GROUP BY canonical ORDER BY canonical""".stripMargin)),

    // bigram LM fluency score: add-k smoothed mean ln P(w2|w1); both corpus
    // counts share one shuffle (c2's (w1,w2) clustering is satisfied by the
    // c1 window's w1 partitioning)
    "ta_bigram_lm" -> Q(
      (s, d) => graft.text.TextAnalysis.bigramLmScore(
          T(s, d, "documents").filter(col("doc_id") < 200), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH base AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS t
             |  FROM documents WHERE doc_id < 200),
             |bi AS (SELECT doc_id, t[CAST(i AS INT)] AS w1, t[CAST(i AS INT) + 1] AS w2
             |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM base)),
             |v AS (SELECT count(DISTINCT tok) AS vocab
             |      FROM (SELECT unnest(t) AS tok FROM base)),
             |c AS (SELECT doc_id, w1, w2,
             |        count(*) OVER (PARTITION BY w1) AS c1,
             |        count(*) OVER (PARTITION BY w1, w2) AS c2
             |      FROM bi)
             |SELECT doc_id, count(*) AS n_bigrams,
             |  round(avg(ln((c2 + 0.5) / (c1 + 0.5 * vocab))), 6) AS avg_logp
             |FROM c, v GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // schema evolution: two drifted parquet batches read back through ONE
    // mergeSchema scan (footer-union at planning, nulls where a batch
    // predates a column); oracle recreates the union relationally
    "src_schema_merge" -> Q(
      (s, d) => {
        val root = FixtureRoot.fresh("evolve")
        val orders = T(s, d, "orders")
        // batch 1: v1 schema (no priority column); batch 2 adds it
        orders.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(root.toString + "/b=1")
        orders.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          .write.mode("overwrite").parquet(root.toString + "/b=2")
        graft.sources.Ingest.readEvolved(s, root.toString)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH unified AS (
             |  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
             |  FROM orders WHERE o_orderkey % 2 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_totalprice, o_orderpriority
             |  FROM orders WHERE o_orderkey % 2 = 1)
             |SELECT o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM unified GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // error-tolerant expression surface: try_cast/try_divide/try_element_at
    // return NULL instead of raising — the ingest-time posture where one
    // malformed value must not fail a 100 TB batch (ANSI mode stays ON for
    // everything else)
    "f22_try_ops" -> Q(
      (s, d) => T(s, d, "documents")
        .select(col("doc_id"),
          expr("try_cast(substring(text, 1, 2) AS INT)").as("maybe_int"),
          try_divide(col("n_chars"), col("doc_id") % 3).as("maybe_div"),
          try_element_at(split(col("source"), "-"), lit(2)).as("maybe_part"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  TRY_CAST(substr(text, 1, 2) AS INT) AS maybe_int,
             |  CASE WHEN doc_id % 3 = 0 THEN NULL
             |       ELSE n_chars / (doc_id % 3) END AS maybe_div,
             |  str_split(source, '-')[2] AS maybe_part
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // categorical aggregate surface: deterministic mode (ties → smallest),
    // count_if; the oracle recomputes the modal value via a rank window
    "a16_mode_aggs" -> Q(
      (s, d) => TestData.events(s, d)
        .groupBy(col("event_type"))
        .agg(mode(col("user_id"), deterministic = true).as("modal_user"),
          count_if(col("value") > 50).as("n_high"),
          min(col("user_id")).as("first_user"))
        .orderBy(col("event_type")),
      Some("""WITH per AS (SELECT event_type, user_id, count(*) AS c,
             |         count(*) FILTER (WHERE value > 50) AS high_c
             |       FROM events GROUP BY event_type, user_id),
             |agg AS (SELECT event_type, CAST(sum(high_c) AS BIGINT) AS n_high,
             |          min(user_id) AS first_user
             |        FROM per GROUP BY event_type),
             |m AS (SELECT event_type, min(user_id) AS modal_user
             |      FROM (SELECT event_type, user_id,
             |              rank() OVER (PARTITION BY event_type ORDER BY c DESC) AS r
             |            FROM per)
             |      WHERE r = 1 GROUP BY event_type)
             |SELECT event_type, modal_user, n_high, first_user
             |FROM agg JOIN m USING (event_type) ORDER BY event_type""".stripMargin)),

    // interval algebra: merge each user's overlapping/touching 30-min
    // purchase windows (running-max-end grouping catches contained
    // intervals); one key shuffle serves both windows and the aggregate
    "x13_interval_merge" -> Q(
      (s, d) => Relational.mergeIntervals(
          TestData.events(s, d).filter(col("event_type") === "purchase")
            .select(col("user_id"), unix_millis(col("ts")).as("s"),
              (unix_millis(col("ts")) + 1800000L).as("e")),
          "user_id", "s", "e")
        .orderBy(col("user_id"), col("merged_start")),
      Some("""WITH iv AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS s,
             |    epoch_ms(CAST(ts AS TIMESTAMP)) + 1800000 AS e
             |  FROM events WHERE event_type = 'purchase'),
             |f AS (SELECT user_id, s, e,
             |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
             |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS me
             |  FROM iv),
             |g AS (SELECT user_id, s, e,
             |    sum(CASE WHEN me IS NULL OR s > me THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS grp
             |  FROM f)
             |SELECT user_id, min(s) AS merged_start, max(e) AS merged_end,
             |  count(*) AS n_intervals
             |FROM g GROUP BY user_id, grp
             |ORDER BY user_id, merged_start""".stripMargin)),

    // k-anonymity audit over a quasi-identifier projection (event_type ×
    // user cohort): groups under k=5 are re-identifiable; suppression is
    // the semi-join twin (GovernanceSpec)
    "gov_k_anonymity" -> Q(
      (s, d) => graft.text.Governance.kAnonymity(
          TestData.events(s, d)
            .select(col("event_type"), (col("user_id") % 37).as("cohort")),
          Seq("event_type", "cohort"), k = 5)
        .orderBy(col("event_type"), col("cohort")),
      Some("""SELECT event_type, user_id % 37 AS cohort,
             |  count(*) AS n_rows, count(*) < 5 AS at_risk
             |FROM events GROUP BY event_type, user_id % 37
             |ORDER BY event_type, cohort""".stripMargin)),

    // ε-DP stats release (round-11): Laplace-noised per-type counts and
    // clipped sums, with the noise drawn DETERMINISTICALLY per (salt,
    // group) from the portable hash-uniform — a pipeline rerun reproduces
    // the same release instead of spending fresh privacy budget, and the
    // oracle replays the identical inverse-CDF arithmetic bit-for-bit.
    // One grouped pass each; the noise is a scalar on the aggregate.
    "gov_dp_release" -> Q(
      (s, d) => {
        val ev = TestData.events(s, d)
        graft.text.Governance.dpCounts(ev, "event_type", epsilon = 1.0)
          .join(graft.text.Governance.dpSum(ev, "event_type", "value",
            clip = 100.0, epsilon = 1.0), Seq("event_type"))
          .orderBy(col("event_type"))
      },
      Some("""WITH u AS (SELECT event_type,
             |    CAST(('0x' || substr(md5('dp|' || event_type), 1, 15)) AS BIGINT)
             |      % 10000 / 10000.0 + 0.00005 AS uc,
             |    CAST(('0x' || substr(md5('dpsum|' || event_type), 1, 15)) AS BIGINT)
             |      % 10000 / 10000.0 + 0.00005 AS us,
             |    count(*) AS n,
             |    sum(least(greatest(value, 0.0), 100.0)) AS cs
             |  FROM events GROUP BY event_type)
             |SELECT event_type, n,
             |  round(n + (-1.0 * sign(uc - 0.5) * ln(1 - 2 * abs(uc - 0.5))), 6) AS noisy_n,
             |  round(cs, 6) AS clipped_sum,
             |  round(cs + (-100.0 * sign(us - 0.5) * ln(1 - 2 * abs(us - 0.5))), 6) AS noisy_sum
             |FROM u ORDER BY event_type""".stripMargin)),

    // filtered vector search: the metadata predicate (lang = 'en') prunes
    // candidates BEFORE any distance math — semi-join then knn, so the
    // scan-side filter composes with the ANN paths' signature prune
    "v8_filtered_knn" -> Q(
      (s, d) => {
        val en = T(s, d, "documents").filter(col("lang") === "en")
          .select(col("doc_id").as("vec_id"))
        val cand = TestData.embeddings(s, d).filter(col("vec_id") =!= 0)
          .join(en, Seq("vec_id"), "left_semi")
        Rag.knn(cand, "vec_id", "embedding", queryVec(s, d), k = 10, minScore = 0.0)
          .select(col("vec_id"), round(col("score"), 6).as("score"))
          .orderBy(col("score").desc, col("vec_id"))
      },
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
             |en AS (SELECT doc_id FROM documents WHERE lang = 'en'),
             |pairs AS (SELECT e.vec_id, unnest(e.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
             |          FROM embeddings e JOIN en ON e.vec_id = en.doc_id, q
             |          WHERE e.vec_id <> 0),
             |scores AS (SELECT vec_id, SUM(x*y) / (SQRT(SUM(x*x)) * SQRT(SUM(y*y))) AS s
             |           FROM pairs GROUP BY vec_id),
             |topk AS (SELECT vec_id, s FROM scores ORDER BY s DESC, vec_id LIMIT 10)
             |SELECT vec_id, round(s, 6) AS score FROM topk WHERE s >= 0.0
             |ORDER BY score DESC, vec_id""".stripMargin)),

    // ordered conversion funnel signup → view → purchase: step i completes
    // at the first qualifying ts AFTER step i-1's completion; the oracle
    // mirrors the cascaded gated mins
    "x14_funnel" -> Q(
      (s, d) => Relational.funnel(
          TestData.events(s, d)
            .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms")),
          "user_id", "event_type", "ms", Seq("signup", "view", "purchase"))
        .orderBy(col("user_id")),
      Some("""WITH e AS (SELECT user_id, event_type,
             |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events
             |  WHERE event_type IN ('signup', 'view', 'purchase')),
             |s1 AS (SELECT user_id, min(ms) FILTER (WHERE event_type = 'signup') AS step_1_ts
             |       FROM e GROUP BY user_id),
             |s2 AS (SELECT e.user_id, min(ms) AS step_2_ts
             |       FROM e JOIN s1 ON e.user_id = s1.user_id
             |       WHERE event_type = 'view' AND ms >= step_1_ts
             |       GROUP BY e.user_id),
             |s3 AS (SELECT e.user_id, min(ms) AS step_3_ts
             |       FROM e JOIN s2 ON e.user_id = s2.user_id
             |       WHERE event_type = 'purchase' AND ms >= step_2_ts
             |       GROUP BY e.user_id)
             |SELECT s1.user_id, step_1_ts, step_2_ts, step_3_ts,
             |  CAST(CASE WHEN step_1_ts IS NULL THEN 0 ELSE 1 END
             |     + CASE WHEN step_2_ts IS NULL THEN 0 ELSE 1 END
             |     + CASE WHEN step_3_ts IS NULL THEN 0 ELSE 1 END AS INT) AS steps_completed
             |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
             |        LEFT JOIN s3 ON s1.user_id = s3.user_id
             |ORDER BY s1.user_id""".stripMargin)),

    // weekly retention cohorts: distinct users active N weeks after their
    // first-seen week; integer period division, no epoch-float rounding
    "x15_retention" -> Q(
      (s, d) => Relational.retentionCohorts(
          TestData.events(s, d)
            .select(col("user_id"), unix_millis(col("ts")).as("ms")),
          "user_id", "ms", periodMs = 604800000L)
        .orderBy(col("cohort_p"), col("offset")),
      Some("""WITH e AS (SELECT user_id,
             |    epoch_ms(CAST(ts AS TIMESTAMP)) // 604800000 AS p FROM events),
             |f AS (SELECT user_id, min(p) AS cohort_p FROM e GROUP BY user_id)
             |SELECT cohort_p, p - cohort_p AS "offset",
             |  count(DISTINCT user_id) AS n_active
             |FROM e JOIN f USING (user_id)
             |GROUP BY cohort_p, "offset" ORDER BY cohort_p, "offset"""".stripMargin)),

    // event transition matrix (1st-order Markov counts): consecutive event
    // pairs per user via a lead window — one key shuffle feeds the window,
    // the (from, to) rollup is a tiny aggregate over |event types|² groups
    "x16_transitions" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ms"), col("event_id"))
        TestData.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("ms"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
             |    epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events),
             |p AS (SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS to_type
             |  FROM e)
             |SELECT from_type, to_type, count(*) AS n
             |FROM p WHERE to_type IS NOT NULL
             |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin)),

    // per-group least-squares fit: one aggregation pass of second moments
    // (map-side partials) — price-vs-quantity slope per return flag
    "a17_regression" -> Q(
      (s, d) => T(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
             |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
             |  regr_count(l_extendedprice, l_quantity) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // pairwise co-occurrence mining (market-basket support): distinct
    // (basket, item) FIRST bounds the self-join at |baskets|·|items|² —
    // the frequent-pair shape that never goes all-pairs over raw rows
    "x17_cooccurrence" -> Q(
      (s, d) => {
        val items = TestData.events(s, d)
          .select(col("user_id"), col("event_type")).distinct()
        items.select(col("user_id"), col("event_type").as("item_a"))
          .join(items.select(col("user_id"), col("event_type").as("item_b")),
            Seq("user_id"))
          .filter(col("item_a") < col("item_b"))
          .groupBy(col("item_a"), col("item_b"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 10)
          .orderBy(col("item_a"), col("item_b"))
      },
      Some("""WITH it AS (SELECT DISTINCT user_id, event_type FROM events)
             |SELECT a.event_type AS item_a, b.event_type AS item_b,
             |  count(*) AS support
             |FROM it a JOIN it b
             |  ON a.user_id = b.user_id AND a.event_type < b.event_type
             |GROUP BY 1, 2 HAVING count(*) >= 10
             |ORDER BY item_a, item_b""".stripMargin)),

    // exact substring dedup at stride granularity: docs sharing any exact
    // 20-token span; md5 window fingerprints, distinct-first, maxDf
    // boilerplate cap before the bucket self-join
    "dd_span_pairs" -> Q(
      (s, d) => Dedup.sharedSpanPairs(T(s, d, "documents"), "doc_id", "text",
          w = 20, stride = 10, maxDf = 50)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH base AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS t
             |  FROM documents),
             |wins AS (SELECT DISTINCT doc_id,
             |    md5(array_to_string(t[CAST(s + 1 AS INT):CAST(s + 20 AS INT)], ' ')) AS fp
             |  FROM (SELECT doc_id, t,
             |          unnest(range(0, len(t) - 20 + 1, 10)) AS s
             |        FROM base WHERE len(t) >= 20)),
             |freq AS (SELECT fp FROM wins GROUP BY fp HAVING count(*) <= 50),
             |b AS (SELECT w.doc_id, w.fp FROM wins w JOIN freq USING (fp))
             |SELECT a.doc_id AS id_a, c.doc_id AS id_b, count(*) AS shared_windows
             |FROM b a JOIN b c ON a.fp = c.fp AND a.doc_id < c.doc_id
             |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin)),

    // Duplicate-span REMOVAL (the rewrite, not just the report): w-token
    // windows at stride 1 shared by >= 2 docs are dropped from every doc
    // and the corpus is re-assembled — exact-substring dedup applied as a
    // transformation. Linear explode, combiner'd df-count, anti-join on
    // (id, pos); no pair join anywhere.
    "dd_span_removal" -> Q(
      (s, d) => Dedup.removeSharedSpans(T(s, d, "documents"), "doc_id", "text",
          w = 20, minDf = 2)
        .orderBy(col("doc_id")),
      Some("""WITH base AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> length(x) > 0) AS t
             |  FROM documents),
             |wins AS (SELECT doc_id, CAST(s AS INT) AS start,
             |    md5(array_to_string(t[CAST(s AS INT):CAST(s + 19 AS INT)], ' ')) AS fp
             |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 20 + 2)) AS s
             |        FROM base WHERE len(t) >= 20)),
             |dup AS (SELECT fp FROM wins GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
             |cov AS (SELECT DISTINCT w.doc_id, CAST(p AS INT) AS pos
             |  FROM wins w JOIN dup USING (fp), unnest(range(w.start, w.start + 20)) AS u(p)),
             |tok AS (SELECT doc_id, CAST(p AS INT) AS pos, t[CAST(p AS INT)] AS tok
             |  FROM base, unnest(range(1, len(t) + 1)) AS u(p)),
             |kept AS (SELECT tok.doc_id, tok.pos, tok.tok
             |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
             |  WHERE cov.doc_id IS NULL),
             |agg AS (SELECT doc_id, count(*) AS n_kept,
             |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
             |  FROM kept GROUP BY 1)
             |SELECT b.doc_id, CAST(len(b.t) AS BIGINT) AS n_tokens,
             |  CAST(len(b.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
             |  coalesce(a.clean_text, '') AS clean_text
             |FROM base b LEFT JOIN agg a USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // per-source quantile normalization: each source's score distribution
    // maps to percentile space so thresholds compare across sources —
    // the comparability step before a cross-source quality gate or mix
    // Source-interleaved training order (round-11): global positions
    // cycle through the live sources round-robin (per-source shuffled
    // round number + windowless arithmetic global position from a
    // broadcast count frame — no single-partition window). The oracle
    // computes the same order with a plain row_number over (rn, source),
    // so the hash compare proves the arithmetic IS the global numbering.
    "cu_interleave" -> Q(
      (s, d) => graft.ops.Curation.interleaveBySource(
          T(s, d, "documents").select(col("doc_id"), col("source")),
          "doc_id", "source")
        .select(col("doc_id"), col("source"), col("__rn"), col("pos"))
        .orderBy(col("pos")),
      Some("""WITH r AS (SELECT doc_id, source,
             |    CAST(row_number() OVER (PARTITION BY source
             |      ORDER BY md5('inter|' || doc_id), doc_id) AS INT) AS "__rn"
             |  FROM documents)
             |SELECT doc_id, source, "__rn",
             |  CAST(row_number() OVER (ORDER BY "__rn", source) AS BIGINT) AS pos
             |FROM r ORDER BY pos""".stripMargin)),

    // A/B experiment analysis (round-11): deterministic hash-split arms
    // (the assignment every experimentation platform uses — stable under
    // reruns and late-arriving data), per-user conversion (> 13 clicks —
    // the dense event fixture gives every user every event type, so a
    // has-event metric saturates and degenerates the z denominator), and
    // the pooled two-proportion z-test with a 1.96 significance flag —
    // exact arithmetic both engines replay. Two aggregates (user rollup,
    // arm rollup), one final scalar row.
    "x19_ab_test" -> Q(
      (s, d) => {
        import graft.ops.Curation
        val users = TestData.events(s, d)
          .select(col("user_id"),
            when(Curation.hashUniform(col("user_id"), "arm") < 0.5, "A")
              .otherwise("B").as("arm"),
            (col("event_type") === "click").cast("int").as("is_click"))
          .groupBy(col("user_id"), col("arm"))
          .agg((sum(col("is_click")) > 13).cast("int").as("converted"))
        val agg = users.agg(
          sum(when(col("arm") === "A", 1).otherwise(0)).cast("long").as("n_a"),
          sum(when(col("arm") === "A", col("converted")).otherwise(0))
            .cast("long").as("c_a"),
          sum(when(col("arm") === "B", 1).otherwise(0)).cast("long").as("n_b"),
          sum(when(col("arm") === "B", col("converted")).otherwise(0))
            .cast("long").as("c_b"))
        val pPool = (col("c_a") + col("c_b")).cast("double") /
          (col("n_a") + col("n_b"))
        val z = (col("c_a") / col("n_a").cast("double") -
            col("c_b") / col("n_b").cast("double")) /
          sqrt(pPool * (lit(1.0) - pPool) *
            (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
        agg.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
          round(z, 6).as("z"), (abs(z) > 1.96).as("significant"))
      },
      Some("""WITH u AS (SELECT user_id,
             |    CASE WHEN CAST(('0x' || substr(md5('arm|' || user_id), 1, 15)) AS BIGINT)
             |           % 10000 / 10000.0 < 0.5 THEN 'A' ELSE 'B' END AS arm,
             |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) > 13
             |         AS INT) AS converted
             |  FROM events GROUP BY 1, 2),
             |a AS (SELECT
             |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS BIGINT) AS c_a,
             |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |    CAST(sum(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS BIGINT) AS c_b
             |  FROM u)
             |SELECT n_a, c_a, n_b, c_b,
             |  round((c_a * 1.0 / n_a - c_b * 1.0 / n_b)
             |    / sqrt(((c_a + c_b) * 1.0 / (n_a + n_b))
             |           * (1 - (c_a + c_b) * 1.0 / (n_a + n_b))
             |           * (1.0 / n_a + 1.0 / n_b)), 6) AS z,
             |  abs((c_a * 1.0 / n_a - c_b * 1.0 / n_b)
             |    / sqrt(((c_a + c_b) * 1.0 / (n_a + n_b))
             |           * (1 - (c_a + c_b) * 1.0 / (n_a + n_b))
             |           * (1.0 / n_a + 1.0 / n_b))) > 1.96 AS significant
             |FROM a""".stripMargin)),

    // Duplication-based oversampling (round-11): minority sources rise
    // ABOVE keep-all via deterministic replication — floor(rate) copies +
    // one more with probability frac(rate) by the portable hash-Bernoulli
    // (the epoch-count up-weighting of published training mixes; closes
    // the gap temperatureMix's own doc defers to). One explode on the
    // scan; the oracle replays copies via range(n).
    "cu_oversample" -> Q(
      (s, d) => graft.ops.Curation.oversample(
          T(s, d, "documents").select(col("doc_id"), col("source")),
          "doc_id", "source",
          rates = Map("src0" -> 2.5, "src1" -> 0.5), defaultRate = 1.0)
        .orderBy(col("doc_id"), col("__copy")),
      Some("""WITH r AS (SELECT doc_id, source,
             |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.5
             |                ELSE 1.0 END AS rate,
             |    CAST(('0x' || substr(md5('over|' || doc_id), 1, 15)) AS BIGINT)
             |      % 10000 / 10000.0 AS u
             |  FROM documents),
             |c AS (SELECT doc_id, source,
             |    CAST(floor(rate) + CASE WHEN u < rate - floor(rate)
             |                            THEN 1 ELSE 0 END AS INT) AS n
             |  FROM r)
             |SELECT doc_id, source, CAST(unnest(range(n)) AS INT) AS "__copy"
             |FROM c WHERE n > 0 ORDER BY doc_id, "__copy" """.stripMargin)),

    // dataset-card generator (round-11): the per-source summary a curation
    // run publishes alongside the corpus — doc/token/char volumes, corpus
    // share, mean entropy, language spread and majority language. One
    // tokenStats pass (the fused operator, reused) + two tiny aggregates;
    // the corpus total rides as a broadcast scalar, the majority language
    // is a WindowGroupLimit top-1 over per-(source, lang) counts.
    "cu_dataset_card" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import graft.text.TextAnalysis
        val docs = T(s, d, "documents")
        val stats = TextAnalysis.tokenStats(docs, "doc_id", "text")
        val bySrc = docs.join(stats, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("n_tokens")), lit(0L)).cast("long").as("total_tokens"),
            sum(length(col("text")).cast("long")).as("total_chars"),
            round(avg(col("entropy")), 6).as("mean_entropy"),
            count_distinct(col("lang")).as("n_langs"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("__n").desc, col("lang"))
        val topLang = docs.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("__n"))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(col("source"), col("lang").as("top_lang"))
        val total = docs.agg(count(lit(1)).cast("double").as("__total"))
        bySrc.join(topLang, "source")
          .crossJoin(broadcast(total))
          .select(col("source"), col("n_docs"),
            round(col("n_docs") / col("__total"), 6).as("corpus_share"),
            col("total_tokens"), col("total_chars"),
            col("mean_entropy"), col("n_langs"), col("top_lang"))
          .orderBy(col("source"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                                    t -> length(t) > 0)) AS tok
             |  FROM documents),
             |tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
             |ent AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |          round(ln(CAST(sum(c) AS BIGINT))
             |            - sum(c * ln(c)) / CAST(sum(c) AS BIGINT), 6) AS entropy
             |        FROM tc GROUP BY 1),
             |base AS (SELECT d.source, d.lang, length(d.text) AS n_chars,
             |           e.n_tokens, e.entropy
             |         FROM documents d LEFT JOIN ent e USING (doc_id)),
             |agg AS (SELECT source, count(*) AS n_docs,
             |          CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS total_tokens,
             |          CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |          round(avg(entropy), 6) AS mean_entropy,
             |          count(DISTINCT lang) AS n_langs
             |        FROM base GROUP BY 1),
             |tl AS (SELECT source, lang AS top_lang FROM (
             |         SELECT source, lang, row_number() OVER (
             |           PARTITION BY source ORDER BY count(*) DESC, lang) AS rn
             |         FROM documents GROUP BY source, lang) t WHERE rn = 1),
             |tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM documents)
             |SELECT a.source, a.n_docs,
             |  round(a.n_docs / tot.total, 6) AS corpus_share,
             |  a.total_tokens, a.total_chars, a.mean_entropy, a.n_langs, tl.top_lang
             |FROM agg a JOIN tl USING (source), tot ORDER BY a.source""".stripMargin)),

    "cu_score_norm" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"),
            round(percent_rank().over(w), 6).as("pct_in_source"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, source, n_chars,
             |  round(percent_rank() OVER (PARTITION BY source
             |                             ORDER BY n_chars, doc_id), 6) AS pct_in_source
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // RLHF/DPO preference-pair assembly: per source, the highest- and
    // lowest-quality docs form one (chosen, rejected) training pair with
    // the score margin. Quality = distinct-token ratio (a repetition
    // signal; exact integer counts, one double division shared by both
    // engines). The arg-extremes are single-pass max_by/min_by aggregates
    // with the tie-break INSIDE the ordering key (score, ∓doc_id) — one
    // keyed shuffle on source, no window over the corpus, so "build pairs
    // per domain over 100 TB" costs what a groupBy costs.
    "cu_preference_pairs" -> Q(
      (s, d) => {
        import graft.text.TextAnalysis
        val scored = T(s, d, "documents")
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokens(col("text")).as("ts"))
          .filter(size(col("ts")) > 0)
          .select(col("doc_id"), col("source"),
            (size(array_distinct(col("ts"))).cast("double") / size(col("ts")))
              .as("score"))
        scored.groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            max_by(struct(col("doc_id"), col("score")),
              struct(col("score"), (-col("doc_id")).as("tb"))).as("ch"),
            min_by(struct(col("doc_id"), col("score")),
              struct(col("score"), col("doc_id"))).as("rj"))
          .filter(col("n_docs") >= 2)
          .select(col("source"), col("n_docs"),
            col("ch.doc_id").as("chosen_id"),
            col("rj.doc_id").as("rejected_id"),
            round(col("ch.score") - col("rj.score"), 6).as("margin"))
          .orderBy(col("source"))
      },
      Some("""WITH toks AS (SELECT doc_id, source,
             |    unnest(list_filter(regexp_split_to_array(text, '\s+'),
             |                       t -> length(t) > 0)) AS tok
             |  FROM documents),
             |sc AS (SELECT doc_id, any_value(source) AS source,
             |    count(DISTINCT tok)::DOUBLE / count(tok) AS score
             |  FROM toks GROUP BY doc_id),
             |ch AS (SELECT source, doc_id AS chosen_id, score AS cs FROM (
             |    SELECT source, doc_id, score, row_number() OVER (
             |      PARTITION BY source ORDER BY score DESC, doc_id) AS rn
             |    FROM sc) t WHERE rn = 1),
             |rj AS (SELECT source, doc_id AS rejected_id, score AS rs FROM (
             |    SELECT source, doc_id, score, row_number() OVER (
             |      PARTITION BY source ORDER BY score ASC, doc_id) AS rn
             |    FROM sc) t WHERE rn = 1),
             |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
             |        FROM sc GROUP BY source)
             |SELECT ch.source, cnt.n_docs, chosen_id, rejected_id,
             |  round(cs - rs, 6) AS margin
             |FROM ch JOIN rj USING (source) JOIN cnt ON cnt.source = ch.source
             |WHERE cnt.n_docs >= 2 ORDER BY ch.source""".stripMargin))
  )

  private val routingTopics = Events.Topics(
    default = "research-workflow-events",
    lifecycle = Some("wf-lifecycle"),
    clarifications = Some("wf-clarifications"),
    artifacts = Some("wf-artifacts"),
    research = Some("wf-research"))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (k, q) => k -> q.fn }.toMap

  def oracleSql: Map[String, String] =
    defs.collect { case (k, Q(_, Some(sql))) => k -> sql }.toMap
}
