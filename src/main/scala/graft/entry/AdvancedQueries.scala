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
private[graft] object AdvancedQueries {

  /** OLAP widening: CUBE / GROUPING SETS / pivot / window frames /
    * exact percentiles / portable hash-sampling / HLL sketches. */
  def defs: Seq[(String, Q)] = Seq(

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
    // Seasonal-profile anomalies (round-13): z against the (metric,
    // hour-of-day) cell, not the global distribution — the profile is
    // |groups|×24 rows and broadcasts; z rounds 4dp (the a14 stats
    // precedent) so the flag predicate replays bit-identically.
    "dq_seasonal_anomaly" -> Q(
      (s, d) => graft.quality.DataQuality.seasonalAnomalies(
          TestData.events(s, d), "event_type", hour(col("ts")), "value",
          zThreshold = 3.0)
        .select(col("event_id"), col("event_type"), col("z"))
        .orderBy(col("event_id")),
      Some("""WITH p AS (
             |  SELECT event_type, hour(ts) AS h, avg(value) AS m,
             |    stddev_samp(value) AS sd, count(value) AS n
             |  FROM events GROUP BY 1, 2)
             |SELECT e.event_id, e.event_type,
             |  round((e.value - p.m) / p.sd, 4) AS z
             |FROM events e JOIN p ON e.event_type = p.event_type
             |  AND hour(e.ts) = p.h
             |WHERE p.sd > 0 AND p.n >= 2
             |  AND abs(round((e.value - p.m) / p.sd, 4)) > 3.0
             |ORDER BY e.event_id""".stripMargin)),

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

    // HLL set operations (round-13): distinct-count INTERSECTION and union
    // between per-type audience sketches via inclusion–exclusion —
    // |A∩B| ≈ est(A) + est(B) − est(A∪B) — the overlap/reach arithmetic a
    // union-only sketch family cannot answer directly, computed from the
    // same mergeable DataSketches HLLs a12 rolls up (lgK=14, rsd≈0.4%, so
    // the 5%-of-union bound sits at ~7σ of the compounded three-sketch
    // error). Exact sets replay as one distinct-(type,user) projection
    // self-joined per pair; bounds are booleans the oracle checks exactly
    // (the a10/a12 pattern — estimates never cross engines).
    "a20_hll_set_ops" -> Q(
      (s, d) => {
        val tu = TestData.events(s, d)
          .select(col("event_type").as("t"), col("user_id").as("u")).distinct()
        val sk = tu.groupBy(col("t"))
          .agg(expr("hll_sketch_agg(u, 14)").as("sk"),
            count(lit(1)).as("exact"))
        val pairs = sk.select(col("t").as("type_a"), col("sk").as("ska"),
            col("exact").as("exact_a"))
          .join(sk.select(col("t").as("type_b"), col("sk").as("skb"),
            col("exact").as("exact_b")), col("type_a") < col("type_b"))
        val inter = tu.select(col("t").as("type_a"), col("u"))
          .join(tu.select(col("t").as("type_b"), col("u")), "u")
          .filter(col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("exact_inter"))
        pairs.join(inter, Seq("type_a", "type_b"), "left")
          .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
          .withColumn("exact_union",
            col("exact_a") + col("exact_b") - col("exact_inter"))
          .withColumn("est_a", expr("hll_sketch_estimate(ska)"))
          .withColumn("est_b", expr("hll_sketch_estimate(skb)"))
          .withColumn("est_union",
            expr("hll_sketch_estimate(hll_union(ska, skb))"))
          .select(col("type_a"), col("type_b"), col("exact_a"), col("exact_b"),
            col("exact_inter"), col("exact_union"),
            (abs(col("est_union") - col("exact_union")) <=
              col("exact_union") * 0.05).as("union_ok"),
            (abs(col("est_a") + col("est_b") - col("est_union") -
              col("exact_inter")) <=
              col("exact_union") * 0.05).as("inter_ok"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u
             |            FROM events),
             |c AS (SELECT t, count(*) AS ec FROM tu GROUP BY 1),
             |i AS (SELECT x.t AS type_a, y.t AS type_b, count(*) AS ei
             |      FROM tu x JOIN tu y ON x.u = y.u AND x.t < y.t
             |      GROUP BY 1, 2)
             |SELECT ca.t AS type_a, cb.t AS type_b,
             |  ca.ec AS exact_a, cb.ec AS exact_b,
             |  coalesce(ei, 0) AS exact_inter,
             |  ca.ec + cb.ec - coalesce(ei, 0) AS exact_union,
             |  TRUE AS union_ok, TRUE AS inter_ok
             |FROM c ca JOIN c cb ON ca.t < cb.t
             |LEFT JOIN i ON i.type_a = ca.t AND i.type_b = cb.t
             |ORDER BY type_a, type_b""".stripMargin)),

    // HLL sketch (approx_count_distinct): estimator internals are
    // engine-specific, so the oracle checks the bounded-relative-error
    // claim (|approx − exact| ≤ 5% · exact) as an exact boolean — the
    // estimate itself never crosses engines. rsd = 0.01 so the pinned 5%
    // bound sits at ~5σ of the sketch's deterministic error: the default
    // 0.05 makes 5% a ONE-sigma event, and at sf0.1 (1500 distinct per
    // group) the estimate landed outside it — caught by the round-10
    // both-SF oracle sweep.
    "a10_approx_distinct" -> Q(
      // round-18 optimization: mixing countDistinct with
      // approx_count_distinct in ONE agg made Spark plan a partial HLL
      // sketch PER (event_type, user_id) GROUP — a 1,641-field aggregate
      // buffer that knocked the 1M-row pass out of whole-stage codegen
      // (spark.sql.codegen.maxFields = 100). Deduplicating the pairs
      // first is bit-identical (an HLL sketch is a function of the SET of
      // values — duplicates never move a register — and COUNT over the
      // deduped pairs IS count(DISTINCT); both ignore nulls the same way)
      // and leaves the sketch buffers to the 5-group final aggregate:
      // the wide pass disappears from the plan (4.24 → 2.4 s isolated).
      (s, d) => TestData.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx"),
          count(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx") - col("exact_users")) <=
            col("exact_users") * 0.05).as("within_5pct"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |  TRUE AS within_5pct
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
