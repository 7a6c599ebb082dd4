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
private[graft] object StoreQueries {

  def defs: Seq[(String, Q)] = Seq(

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
    // Timestamp time travel (round-12): FOR SYSTEM_TIME AS OF over the
    // manifest-mtime commit clock (the same clock expireOlderThan keys
    // on). Commit times are PINNED via setTimes in the fixture so the
    // version choice is deterministic for the oracle: a cutoff between
    // the two commits reads v1 (the even keys), a later cutoff reads the
    // head, a cutoff before the first commit errors.
    "snap_asof_read" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapasof")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Snapshots.write(orders.filter(pmod(col("o_orderkey"), lit(2)) === 0), base)
        Snapshots.append(orders.filter(pmod(col("o_orderkey"), lit(2)) === 1), base)
        val fsys = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sessionState.newHadoopConf())
        val t0 = 1700000000000L
        fsys.setTimes(new org.apache.hadoop.fs.Path(s"$base/v=1/_manifest"), t0, -1)
        fsys.setTimes(new org.apache.hadoop.fs.Path(s"$base/v=2/_manifest"), t0 + 60000, -1)
        val headRows = Snapshots.readAsOf(s, base, t0 + 120000).count()
        val tooEarlyErrors =
          try { Snapshots.readAsOf(s, base, t0 - 1); false }
          catch { case _: IllegalArgumentException => true }
        Snapshots.readAsOf(s, base, t0 + 1000)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("head_rows", lit(headRows))
          .withColumn("too_early_errors", lit(tooEarlyErrors))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  (SELECT count(*) FROM orders) AS head_rows,
             |  TRUE AS too_early_errors
             |FROM orders WHERE o_orderkey % 2 = 0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // GDPR-style erasure with an audit trail (round-12): deleteWhere
    // executes the right-to-be-forgotten request (file-level
    // copy-on-write: only files containing matching keys rewrite), the
    // post-state is verified empty of the erased keys, and the CDC diff
    // between the two snapshots must classify EXACTLY the erased rows as
    // deletes and nothing else — the provable-erasure workflow a
    // versioned 100 TB store owes its compliance team. Oracle recomputes
    // the surviving content plus literal pins on the audit counts.
    "gov_erasure_audit" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("goverasure")
        val base = root + "/t"
        val cust = T(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        Snapshots.write(cust, base, statsKey = Some("c_custkey"))
        val v2 = Snapshots.deleteWhere(s, base, pmod(col("c_custkey"), lit(7)) === 0)
        val erasedGone = Snapshots.read(s, base)
          .filter(pmod(col("c_custkey"), lit(7)) === 0).isEmpty
        val audit = Snapshots.diff(s, base, 1L, v2, "c_custkey")
          .groupBy(col("change_type")).agg(count(lit(1)).as("cnt"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        Snapshots.read(s, base)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total"))
          .withColumn("erased_gone", lit(erasedGone))
          .withColumn("n_cdc_deletes", lit(audit.getOrElse("delete", 0L)))
          .withColumn("n_cdc_other", lit(
            audit.view.filterKeys(_ != "delete").values.sum))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  TRUE AS erased_gone,
             |  (SELECT count(*) FROM customer WHERE c_custkey % 7 = 0) AS n_cdc_deletes,
             |  CAST(0 AS BIGINT) AS n_cdc_other
             |FROM customer WHERE c_custkey % 7 <> 0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Incremental append read (round-12): Iceberg's between-snapshots
    // incremental scan — exactly the rows added after a version, planned
    // as a manifest set-diff (O(delta) metadata + O(delta) data, never a
    // table rescan). The fixture's third version is a branch fast-forward
    // publish, so the diff correctly picks up added files living in the
    // BRANCH namespace; reading from the head yields zero rows. Oracle
    // recomputes the two appended slices.
    "snap_incremental_read" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapincr")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Snapshots.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 0), base)
        Snapshots.append(orders.filter(pmod(col("o_orderkey"), lit(3)) === 1), base)
        Snapshots.createBranch(s, base, "pub", fromVersion = 2L)
        Snapshots.appendBranch(
          orders.filter(pmod(col("o_orderkey"), lit(3)) === 2), base, "pub")
        Snapshots.fastForward(s, base, "pub")
        val emptyAtHead = Snapshots.appendedSince(s, base, 3L).isEmpty
        Snapshots.appendedSince(s, base, 1L)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("empty_at_head", lit(emptyAtHead))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  TRUE AS empty_at_head
             |FROM orders WHERE o_orderkey % 3 <> 0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Predicate-pruned read (round-12): min/max file skipping on the scan
    // path — the fixture range-clusters orders by key at write time (the
    // layout that makes manifest stats selective), then a key-range query
    // plans via scanPlan and must (a) provably skip files from metadata
    // alone (pruned_some pins it) and (b) return byte-identical rows to
    // the full-scan filter the oracle computes. This is the read-side
    // half of the stats machinery deleteWhere/mergeInto already use.
    "snap_stats_prune" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapprune")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Snapshots.write(orders.repartitionByRange(8, col("o_orderkey")),
          base, statsKey = Some("o_orderkey"))
        val pred = col("o_orderkey") < lit(3000L)
        val (cand, pruned) = Snapshots.scanPlan(s, base, pred)
        Snapshots.scanWhere(s, base, pred)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("pruned_some", lit(pruned.nonEmpty && cand.nonEmpty))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  TRUE AS pruned_some
             |FROM orders WHERE o_orderkey < 3000
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Merge-on-read delete (round-13): Iceberg-v2-style positional delete
    // file committed WITHOUT rewriting data files, then materialized
    // (affected-file-only rewrite). The key checks BOTH read paths — the
    // anti-join read under a pending delete and the folded read after
    // materializeDeletes — against the same relational oracle, plus their
    // agreement as a boolean.
    "snap_mor_delete" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapmor")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(docs.filter(col("doc_id") % 2 === 0).repartition(2),
          base, statsKey = Some("doc_id"))
        Snapshots.append(docs.filter(col("doc_id") % 2 === 1).repartition(2),
          base, statsKey = Some("doc_id"))
        Snapshots.deleteWhereMoR(s, base, col("doc_id") % 5 === 0)
        val pending = Snapshots.read(s, base)
          .agg(count(lit(1)), sum(col("doc_id"))).head()
        Snapshots.materializeDeletes(s, base, statsKey = Some("doc_id"))
        val folded = Snapshots.read(s, base)
          .agg(count(lit(1)), sum(col("doc_id"))).head()
        Snapshots.read(s, base)
          .withColumn("paths_agree", lit(pending == folded))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, source, n_chars, TRUE AS paths_agree
             |FROM documents WHERE doc_id % 5 <> 0
             |ORDER BY doc_id""".stripMargin)),

    // Equality deletes (round-13): merge-on-read DELETE BY KEY — a key-set
    // file committed with ZERO data scan, applied by readers as a
    // null-safe anti-join scoped to the files present at delete time.
    // The fixture proves the sequence scoping: doc_id % 11 == 0 rows are
    // key-deleted, then the sub-100 slice of those keys is REINSERTED with
    // a marked source — the reinserted rows must survive the delete that
    // preceded them. Both the pending (anti-join) and materialized (folded)
    // read paths are compared via the agreement boolean.
    "snap_eq_delete" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapeq")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(docs.repartitionByRange(4, col("doc_id")), base,
          statsKey = Some("doc_id"))
        Snapshots.deleteByKey(s, base,
          docs.filter(col("doc_id") % 11 === 0).select(col("doc_id")))
        Snapshots.append(
          docs.filter(col("doc_id") % 11 === 0 && col("doc_id") < 100)
            .withColumn("source", concat(lit("reinserted-"), col("source"))),
          base, statsKey = Some("doc_id"))
        val pending = Snapshots.read(s, base)
          .agg(count(lit(1)), sum(col("doc_id")), sum(col("n_chars"))).head()
        Snapshots.materializeDeletes(s, base, statsKey = Some("doc_id"))
        val folded = Snapshots.read(s, base)
          .agg(count(lit(1)), sum(col("doc_id")), sum(col("n_chars"))).head()
        Snapshots.read(s, base)
          .withColumn("paths_agree", lit(pending == folded))
          .orderBy(col("doc_id"), col("source"))
      },
      Some("""SELECT doc_id, source, n_chars, TRUE AS paths_agree
             |FROM documents WHERE doc_id % 11 <> 0
             |UNION ALL
             |SELECT doc_id, 'reinserted-' || source AS source, n_chars,
             |       TRUE AS paths_agree
             |FROM documents WHERE doc_id % 11 = 0 AND doc_id < 100
             |ORDER BY doc_id, source""".stripMargin)),

    // UPDATE WHERE (round-13): the third DML verb — copy-on-write at file
    // granularity, matched rows get simultaneous SET assignments evaluated
    // against the OLD row, clean files inherit by reference. Oracle is the
    // equivalent CASE projection; the `inherited_some` boolean pins that
    // the commit actually reused prior manifest entries rather than
    // rewriting the table.
    "snap_update_where" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapupd")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(docs.repartitionByRange(6, col("doc_id")), base,
          statsKey = Some("doc_id"))
        val hit = col("doc_id") % 7 === 0 && col("doc_id") < 200
        val v = Snapshots.updateWhere(s, base, hit, Seq(
          "source" -> concat(lit("redacted-"), col("source")),
          "n_chars" -> -col("n_chars")))
        val prior = Snapshots.manifestLines(s, base, v - 1).toSet
        val inherited = Snapshots.manifestLines(s, base, v).count(prior.contains)
        Snapshots.read(s, base)
          .withColumn("inherited_some", lit(inherited > 0))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  CASE WHEN doc_id % 7 = 0 AND doc_id < 200
             |       THEN 'redacted-' || source ELSE source END AS source,
             |  CASE WHEN doc_id % 7 = 0 AND doc_id < 200
             |       THEN -n_chars ELSE n_chars END AS n_chars,
             |  TRUE AS inherited_some
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Per-file bloom sidecars (round-13): the point-lookup index beyond
    // min/max — three stat-LESS appends (bounds cannot prune), sidecars
    // built post-commit, then a present + an absent id lookup. Oracle is
    // the plain source-table equality; the pruning proof (≤ one file's
    // records read, 0 for an absent key) lives in SnapshotsSpec.
    "snap_point_bloom" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapbloom")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(docs.filter(col("doc_id") % 3 === 0).repartition(2), base)
        Snapshots.append(docs.filter(col("doc_id") % 3 === 1).repartition(2), base)
        Snapshots.append(docs.filter(col("doc_id") % 3 === 2).repartition(2), base)
        val built = Snapshots.writeBloomSidecars(s, base, "doc_id",
          expectedItems = 100000L)
        Snapshots.pointLookup(s, base, "doc_id", 123L)
          .unionByName(Snapshots.pointLookup(s, base, "doc_id", -1L))
          .withColumn("built_all", lit(built >= 3))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, source, n_chars, TRUE AS built_all
             |FROM documents WHERE doc_id = 123 ORDER BY doc_id""".stripMargin)),

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
      Option(recallOracleState.get()).map(recallOracleSqlFor)),

    // Metadata-only aggregates (round-13): count(*) and MIN/MAX answered
    // from manifest record counts / per-file bounds with ZERO data-file
    // IO — counting a 100 TB table as a driver-side manifest fold. The
    // fixture commits two appends (counts recorded per file), takes the
    // metadata bounds while sound, then a positional MoR delete; the
    // post-delete count subtracts distinct delete positions without
    // touching a data file. The zero-IO proof (count survives physically
    // deleted data files) lives in SnapshotsSpec.
    "snap_meta_count" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapmeta")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(docs.filter(pmod(col("doc_id"), lit(2)) === 0)
          .repartition(3), base, statsKey = Some("doc_id"))
        Snapshots.append(docs.filter(pmod(col("doc_id"), lit(2)) === 1)
          .repartition(3), base, statsKey = Some("doc_id"))
        val nFull = Snapshots.metaCount(s, base).get
        val Some((boundsKey, mn, mx)) = Snapshots.metaBounds(s, base)
        Snapshots.deleteWhereMoR(s, base, pmod(col("doc_id"), lit(5)) === 0)
        val nAfter = Snapshots.metaCount(s, base).get
        val boundsGoneUnderDeletes = Snapshots.metaBounds(s, base).isEmpty
        import s.implicits._
        Seq((nFull, nAfter, boundsKey, mn.toLong, mx.toLong,
          boundsGoneUnderDeletes))
          .toDF("n_full", "n_after_delete", "bounds_key", "min_id", "max_id",
            "bounds_gone_under_deletes")
      },
      Some("""SELECT (SELECT count(*) FROM documents) AS n_full,
             |  (SELECT count(*) FROM documents WHERE doc_id % 5 <> 0)
             |    AS n_after_delete,
             |  'doc_id' AS bounds_key,
             |  (SELECT min(doc_id) FROM documents) AS min_id,
             |  (SELECT max(doc_id) FROM documents) AS max_id,
             |  TRUE AS bounds_gone_under_deletes""".stripMargin)),

    // Multi-column stats sidecars (round-13): countWhere on columns the
    // manifest key does NOT cover — bounds come from per-file .stats
    // sidecars (min/max/nulls for n_chars and source), built in one job.
    // Counts are layout-independent (exact regardless of what pruned);
    // the zero-IO pruning proof lives in SnapshotsSpec.
    "snap_sidecar_count" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapsc")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(docs.repartitionByRange(5, col("doc_id")), base,
          statsKey = Some("doc_id"))
        val built = Snapshots.writeStatsSidecars(s, base,
          Seq("n_chars", "source"))
        import s.implicits._
        Seq((built.toLong,
          Snapshots.countWhere(s, base, col("n_chars") <= 500),
          Snapshots.countWhere(s, base,
            col("n_chars") > 200 && col("n_chars") <= 800),
          Snapshots.countWhere(s, base, col("source") === "src3"),
          Snapshots.countWhere(s, base,
            col("doc_id") <= 250L && col("n_chars") <= 500)))
          .toDF("n_sidecars", "n_le", "n_range", "n_src", "n_mixed")
      },
      Some("""SELECT 5 AS n_sidecars,
             |  (SELECT count(*) FROM documents WHERE n_chars <= 500) AS n_le,
             |  (SELECT count(*) FROM documents
             |     WHERE n_chars > 200 AND n_chars <= 800) AS n_range,
             |  (SELECT count(*) FROM documents WHERE source = 'src3') AS n_src,
             |  (SELECT count(*) FROM documents
             |     WHERE doc_id <= 250 AND n_chars <= 500) AS n_mixed""".stripMargin)),

    // HLL distinct-count view (round-13): the mergeable-sketch MV — create
    // on one slice, refresh over two appended slices (overlapping users,
    // so the merge must dedupe, not add), estimates within 5% of exact
    // (lgK=14 ≈ 0.4% rsd — the a12 bounded-error pattern; estimates never
    // cross engines).
    "snap_mv_distinct" -> Q(
      (s, d) => {
        import graft.store.{MatView, Snapshots}
        val root = FixtureRoot.fresh("snapmvd")
        val (base, mv) = (root + "/t", root + "/mv")
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_custkey"))
        Snapshots.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 0), base)
        MatView.createDistinctView(s, base, mv, Seq("o_orderpriority"),
          "o_custkey", lgK = 14)
        Snapshots.append(orders.filter(pmod(col("o_orderkey"), lit(3)) === 1), base)
        Snapshots.append(orders.filter(pmod(col("o_orderkey"), lit(3)) === 2), base)
        MatView.refreshDistinctView(s, base, mv, Seq("o_orderpriority"),
          "o_custkey", lgK = 14)
        MatView.readDistinctView(s, mv)
          .join(T(s, d, "orders").groupBy(col("o_orderpriority"))
              .agg(countDistinct(col("o_custkey")).as("exact_custs")),
            Seq("o_orderpriority"))
          .select(col("o_orderpriority"), col("exact_custs"),
            (abs(col("approx_distinct") - col("exact_custs")) <=
              col("exact_custs") * 0.05).as("within_5pct"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
             |  count(DISTINCT o_custkey) AS exact_custs, TRUE AS within_5pct
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Hybrid COUNT WHERE (round-13): files provably outside the range
    // contribute 0, files provably fully inside (min/max + zero nulls)
    // contribute their recorded footer counts unopened, and only
    // boundary files are scanned with the residual. Counts must be
    // layout-independent — the oracle is the plain filtered count; the
    // boundary-only-IO proof (0 records for covered ranges) lives in
    // SnapshotsSpec.
    "snap_count_where" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapcw")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(docs.repartitionByRange(6, col("doc_id")), base,
          statsKey = Some("doc_id"))
        import s.implicits._
        Seq((
          Snapshots.countWhere(s, base, col("doc_id") <= 333L),
          Snapshots.countWhere(s, base,
            col("doc_id") > 100L && col("doc_id") <= 400L),
          Snapshots.countWhere(s, base, col("doc_id") === 123L),
          Snapshots.countWhere(s, base, col("doc_id") < 0L)))
          .toDF("n_le", "n_range", "n_eq", "n_none")
      },
      Some("""SELECT
             |  (SELECT count(*) FROM documents WHERE doc_id <= 333) AS n_le,
             |  (SELECT count(*) FROM documents
             |     WHERE doc_id > 100 AND doc_id <= 400) AS n_range,
             |  (SELECT count(*) FROM documents WHERE doc_id = 123) AS n_eq,
             |  (SELECT count(*) FROM documents WHERE doc_id < 0) AS n_none""".stripMargin)),

    // One-verb maintenance (round-13): three small appends + a pending MoR
    // delete, then maintain() folds the delete, bin-packs the nine tiny
    // files, expires to one snapshot, and vacuums — content must be
    // bit-identical to the source minus the delete (the oracle), and the
    // report booleans pin that each step actually fired.
    "snap_maintain" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapmaint")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(docs.filter(pmod(col("doc_id"), lit(3)) === 0)
          .repartition(3), base, statsKey = Some("doc_id"))
        Snapshots.append(docs.filter(pmod(col("doc_id"), lit(3)) === 1)
          .repartition(3), base, statsKey = Some("doc_id"))
        Snapshots.append(docs.filter(pmod(col("doc_id"), lit(3)) === 2)
          .repartition(3), base, statsKey = Some("doc_id"))
        Snapshots.deleteWhereMoR(s, base, pmod(col("doc_id"), lit(7)) === 0)
        val r = Snapshots.maintain(s, base, smallBytes = 64L * 1024 * 1024,
          keepSnapshots = 1, statsKey = Some("doc_id"))
        Snapshots.read(s, base)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
          .withColumn("deletes_folded", lit(r.deletesFolded))
          .withColumn("compacted", lit(r.compactedToVersion.isDefined))
          .withColumn("n_versions_left",
            lit(Snapshots.versions(s, base).size))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  TRUE AS deletes_folded, TRUE AS compacted,
             |  1 AS n_versions_left
             |FROM documents WHERE doc_id % 7 <> 0
             |GROUP BY 1 ORDER BY source""".stripMargin)),

    // Materialized-view lifecycle (round-13): create → two appends →
    // O(delta) refresh (appendedSince fast path) → CoW delete (breaks the
    // append chain) → CDC-fallback refresh. The final view must equal a
    // full recompute bit-exactly (decimal sums are associative), which is
    // exactly what the oracle computes from the orders table; src_version
    // pins that the anchor advanced through all five source versions. The
    // O(delta)-records proof lives in MatViewSpec.
    "snap_mv_agg" -> Q(
      (s, d) => {
        import graft.store.{MatView, Snapshots}
        val root = FixtureRoot.fresh("snapmv")
        val (base, mv) = (root + "/t", root + "/mv")
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        Snapshots.write(orders.filter(pmod(col("o_orderkey"), lit(3)) === 0), base)
        MatView.create(s, base, mv, Seq("o_orderpriority"), "o_totalprice")
        Snapshots.append(orders.filter(pmod(col("o_orderkey"), lit(3)) === 1), base)
        Snapshots.append(orders.filter(pmod(col("o_orderkey"), lit(3)) === 2), base)
        MatView.refresh(s, base, mv, Seq("o_orderpriority"), "o_totalprice")
        Snapshots.deleteWhere(s, base, pmod(col("o_orderkey"), lit(11)) === 0)
        MatView.refresh(s, base, mv, Seq("o_orderpriority"), "o_totalprice",
          cdcKey = Some("o_orderkey"))
        Snapshots.read(s, mv)
          .select(col("o_orderpriority"), col("n"),
            col("total").cast("double").as("total"),
            col(MatView.SrcVersionCol).as("src_version"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  4 AS src_version
             |FROM orders WHERE o_orderkey % 11 <> 0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // String-bounds file pruning (round-14): the commonest 100 TB filter
    // is a partition-like string equality — files are range-clustered by
    // `source`, the manifest records string-tagged (UTF-8 byte order)
    // min/max per file, and a `source = 'src3'` scan must provably skip
    // files from metadata alone (pruned_some pins it) while returning
    // byte-identical rows to the oracle's full-scan filter. The
    // records-read IO assertion lives in SnapshotsSpec.
    "snap_str_prune" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapstrp")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(
          docs.repartitionByRange(6, col("source"), col("doc_id")), base,
          statsKey = Some("source"))
        val pred = col("source") === "src3"
        val (cand, pruned) = Snapshots.scanPlan(s, base, pred)
        Snapshots.scanWhere(s, base, pred)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), dsum(col("n_chars")).as("sum_chars"))
          .withColumn("pruned_some", lit(pruned.nonEmpty && cand.nonEmpty))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n,
             |  CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS sum_chars,
             |  TRUE AS pruned_some
             |FROM documents WHERE source = 'src3'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // IN-list file pruning (round-14): `key IN (…)` is the other commonest
    // 100 TB filter shape — the conjunctive bounds map cannot express a
    // disjunction, so the planner prunes per VALUE: a file survives only
    // if some IN value sits inside its [min,max] (and its bloom, when one
    // exists, admits a surviving value). The fixture range-clusters orders
    // by key and probes a 3-value IN confined to one end plus a countWhere
    // over a wider mixed list; both must match the oracle's plain filters
    // while provably skipping files (pruned_some pins it; the records-read
    // proof lives in SnapshotsSpec).
    "snap_in_prune" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapin")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Snapshots.write(orders.repartitionByRange(8, col("o_orderkey")),
          base, statsKey = Some("o_orderkey"))
        val inPred = col("o_orderkey").isin(7L, 32L, 69L)
        val (cand, pruned) = Snapshots.scanPlan(s, base, inPred)
        val nWide = Snapshots.countWhere(s, base,
          col("o_orderkey").isin((1L to 40L).map(java.lang.Long.valueOf): _*))
        Snapshots.scanWhere(s, base, inPred)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").cast("double").as("price"))
          .withColumn("pruned_some", lit(pruned.nonEmpty && cand.nonEmpty))
          .withColumn("n_wide_in", lit(nWide))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  CAST(o_totalprice AS DOUBLE) AS price, TRUE AS pruned_some,
             |  (SELECT count(*) FROM orders
             |     WHERE o_orderkey BETWEEN 1 AND 40) AS n_wide_in
             |FROM orders WHERE o_orderkey IN (7, 32, 69)
             |ORDER BY o_orderkey""".stripMargin)),

    // MERGE with a delete clause (round-14): Iceberg's WHEN MATCHED THEN
    // DELETE — one copy-on-write merge applies a mixed upsert/delete CDC
    // batch: odd keys under 500 get their price negated (update), keys
    // divisible by 9 retract (delete), keys 9000001..9000040 insert, and a
    // delete of an absent key no-ops. The oracle replays the batch
    // relationally; file-granular CoW and pruning are the same machinery
    // snap_merge already pins.
    "snap_merge_delete" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapmdel")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Snapshots.write(orders.repartitionByRange(4, col("o_orderkey")),
          base, statsKey = Some("o_orderkey"))
        import s.implicits._
        val updates = orders
          .filter(col("o_orderkey") % 2 === 1 && col("o_orderkey") < 500 &&
            col("o_orderkey") % 9 =!= 0) // a key must not be updated AND deleted
          .withColumn("o_totalprice", -col("o_totalprice"))
          .withColumn("__op", lit("u"))
        val deletes = orders.filter(col("o_orderkey") % 9 === 0)
          .withColumn("__op", lit("d"))
        val inserts = (9000001L to 9000040L).map(k => (k, "Z", 1.0))
          .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
          .withColumn("__op", lit("u"))
        val ghost = Seq((999999L, "Z", 0.0))
          .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
          .withColumn("__op", lit("d"))
        Snapshots.mergeInto(s, base,
          updates.unionByName(deletes).unionByName(inserts).unionByName(ghost),
          "o_orderkey", deleteWhen = Some(col("__op") === "d"))
        Snapshots.read(s, base)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH merged AS (
             |  SELECT o_orderkey, o_orderstatus,
             |    CASE WHEN o_orderkey % 2 = 1 AND o_orderkey < 500
             |         THEN -o_totalprice ELSE o_totalprice END AS o_totalprice
             |  FROM orders WHERE o_orderkey % 9 <> 0
             |  UNION ALL
             |  SELECT 9000000 + i, 'Z', 1.0
             |  FROM generate_series(1, 40) AS t(i))
             |SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin)),

    // MERGE WHEN NOT MATCHED BY SOURCE (round-15): Delta's third clause
    // family completes the three-way merge — one commit reconciles a full
    // snapshot feed: matched keys upsert (price doubled), unmatched source
    // rows insert, and TARGET rows the feed no longer carries are retired
    // (high-key delete clause) or flagged (low-key update clause, whose
    // simultaneous assignments read the OLD row: status:='X' AND price
    // negated together). Each clause's bounds prune its own discovery
    // scan; the files_shared boolean pins that untouched mid-range files
    // were inherited by reference, not rewritten.
    "snap_merge_nmbs" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapnmbs")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Snapshots.write(orders.repartitionByRange(6, col("o_orderkey")),
          base, statsKey = Some("o_orderkey"))
        import s.implicits._
        val matched = orders
          .filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") < 2000)
          .withColumn("o_totalprice", col("o_totalprice") * 2)
        val inserts = (9000001L to 9000020L).map(k => (k, "Z", 1.0))
          .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
        val preFiles = Snapshots.manifestFiles(s, base, 1L).toSet
        Snapshots.mergeInto(s, base, matched.unionByName(inserts), "o_orderkey",
          notMatchedBySourceDelete = Some(
            col("o_orderkey").between(50000L, 60000L) && col("o_orderkey") % 3 === 0),
          notMatchedBySourceUpdate = Some((
            col("o_orderkey") <= 3000L && col("o_orderkey") % 5 === 0,
            Map("o_orderstatus" -> lit("X"),
                "o_totalprice" -> -col("o_totalprice")))))
        val postFiles = Snapshots.manifestFiles(s, base,
          Snapshots.versions(s, base).last).toSet
        val filesShared = (preFiles intersect postFiles).nonEmpty
        Snapshots.read(s, base)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("files_shared", lit(filesShared))
          .orderBy(col("o_orderstatus"))
      },
      Some("""WITH merged AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
             |  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey < 2000
             |  UNION ALL
             |  SELECT 9000000 + i, 'Z', 1.0 FROM generate_series(1, 20) AS t(i)
             |  UNION ALL
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderkey <= 3000 AND o_orderkey % 5 = 0
             |         THEN 'X' ELSE o_orderstatus END,
             |    CASE WHEN o_orderkey <= 3000 AND o_orderkey % 5 = 0
             |         THEN -o_totalprice ELSE o_totalprice END
             |  FROM orders
             |  WHERE NOT (o_orderkey % 7 = 0 AND o_orderkey < 2000)
             |    AND NOT (o_orderkey BETWEEN 50000 AND 60000 AND o_orderkey % 3 = 0))
             |SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  TRUE AS files_shared
             |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Full-row CDC feed (round-15): Delta's table_changes shape — every
    // logical change between two versions as rows with _change_type
    // (insert / delete / update_preimage+postimage pairs), state-based so
    // intermediate churn collapses (a key updated at v2 then deleted at
    // v3 surfaces as ONE delete carrying the v1 image). The 100 TB path
    // is O(delta) file scoping: each side reads only its version's
    // non-shared files (pinned in CdcChangesSpec); the oracle replays the
    // whole three-commit history relationally.
    "snap_changes" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapchg")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        Snapshots.write(orders.repartitionByRange(4, col("o_orderkey")),
          base, statsKey = Some("o_orderkey"))
        Snapshots.updateWhere(s, base,
          col("o_orderkey").between(100L, 200L),
          Seq("o_totalprice" -> (col("o_totalprice") * 2)))
        Snapshots.deleteWhere(s, base,
          col("o_orderkey") % 13 === 0 && col("o_orderkey") <= 1000L)
        import s.implicits._
        Snapshots.append((9000001L to 9000010L).map(k => (k, 1.0))
          .toDF("o_orderkey", "o_totalprice"), base)
        Snapshots.changes(s, base, 1L,
            Snapshots.versions(s, base).last, "o_orderkey")
          .select(col("o_orderkey"),
            col("o_totalprice").cast("double").as("price"),
            col("_change_type"))
          .orderBy(col("o_orderkey"), col("_change_type"))
      },
      Some("""WITH v1 AS (
             |  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS p
             |  FROM orders),
             |v4 AS (
             |  SELECT k, CASE WHEN k BETWEEN 100 AND 200 THEN p * 2 ELSE p END AS p
             |  FROM v1 WHERE NOT (k % 13 = 0 AND k <= 1000)
             |  UNION ALL
             |  SELECT 9000000 + i, 1.0 FROM generate_series(1, 10) AS t(i)),
             |chg AS (
             |  SELECT k, p, 'insert' AS ct FROM v4
             |    WHERE k NOT IN (SELECT k FROM v1)
             |  UNION ALL
             |  SELECT k, p, 'delete' FROM v1
             |    WHERE k NOT IN (SELECT k FROM v4)
             |  UNION ALL
             |  SELECT v1.k, v1.p, 'update_preimage'
             |    FROM v1 JOIN v4 USING (k) WHERE v1.p <> v4.p
             |  UNION ALL
             |  SELECT v4.k, v4.p, 'update_postimage'
             |    FROM v1 JOIN v4 USING (k) WHERE v1.p <> v4.p)
             |SELECT k AS o_orderkey, p AS price, ct AS "_change_type"
             |FROM chg ORDER BY 1, 3""".stripMargin)),

    // OPTIMIZE / cluster rewrite (round-15): Delta OPTIMIZE ZORDER's
    // linear cousin — a table written in ARRIVAL order (round-robin
    // files, every file spanning the whole keyspace, so bounds prune
    // nothing) gets one full CoW cluster rewrite on the key, after which
    // the same range scan admits only boundary files. Pruning quality is
    // what a maintenance verb buys at 100 TB: ingest appends in arrival
    // order all day, the scheduled cluster rewrite restores metadata
    // selectivity. The before/after scanPlan booleans pin the flip; the
    // aggregate pins content invariance against the raw table.
    "snap_cluster_sort" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapclus")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        Snapshots.write(orders.repartition(4), base,
          statsKey = Some("o_orderkey"))
        val lowScan = col("o_orderkey") <= 100L
        val (c1, p1) = Snapshots.scanPlan(s, base, lowScan)
        Snapshots.rewriteSorted(s, base, Seq("o_orderkey"),
          targetBytes = 64L * 1024)
        val (c2, p2) = Snapshots.scanPlan(s, base, lowScan)
        val nLow = Snapshots.countWhere(s, base, lowScan)
        Snapshots.read(s, base)
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("n_low", lit(nLow))
          .withColumn("pruned_before", lit(p1.nonEmpty && c1.nonEmpty))
          .withColumn("pruned_after", lit(p2.nonEmpty && c2.nonEmpty))
      },
      Some("""SELECT count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  (SELECT count(*) FROM orders WHERE o_orderkey <= 100) AS n_low,
             |  FALSE AS pruned_before, TRUE AS pruned_after
             |FROM orders""".stripMargin)),

    // Health-triggered maintenance (round-15): clusteringDepth measures
    // layout health from metadata alone — the expected number of files a
    // uniform point probe admits (arrival order ≈ file count, clustered
    // = 1) — and maintain(clusterBy) re-clusters ONLY past the threshold,
    // so the nightly job stops rewriting healthy tables on a blind
    // schedule. Booleans pin the full cycle: degraded before, trigger
    // fires, healthy after, second run quiet.
    "snap_cluster_health" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapchealth")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        Snapshots.write(orders.repartition(4), base,
          statsKey = Some("o_orderkey"))
        val d0 = Snapshots.clusteringDepth(s, base, "o_orderkey").getOrElse(0.0)
        val r1 = Snapshots.maintain(s, base, targetBytes = 64L * 1024,
          clusterBy = Some(Seq("o_orderkey")), maxClusterDepth = 2.0)
        val d1 = Snapshots.clusteringDepth(s, base, "o_orderkey").getOrElse(99.0)
        val r2 = Snapshots.maintain(s, base, targetBytes = 64L * 1024,
          clusterBy = Some(Seq("o_orderkey")), maxClusterDepth = 2.0)
        Snapshots.read(s, base)
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("degraded_before", lit(d0 > 2.0))
          .withColumn("trigger_fired", lit(r1.clusteredToVersion.isDefined))
          .withColumn("healthy_after", lit(d1 <= 1.5))
          .withColumn("second_run_quiet", lit(r2.clusteredToVersion.isEmpty))
      },
      Some("""SELECT count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  TRUE AS degraded_before, TRUE AS trigger_fired,
             |  TRUE AS healthy_after, TRUE AS second_run_quiet
             |FROM orders""".stripMargin)),

    // Quantile sketch sidecars (round-15): per-file mergeable KLL sketches
    // — the quantile sibling of snap_ndv, Iceberg-puffin-style stats in
    // miniature. One build over the files, then p50/p90 answer from
    // METADATA (zero data records once covered — IO pin in the spec); a
    // fresh append pays a delta-only union scan. Estimates never cross
    // engines (the a18/a19 rule): the oracle checks the exact inverse-CDF
    // RANK of each estimate sits inside the KLL error window.
    "snap_quantile" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapkll")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        Snapshots.write(orders.filter(col("o_orderkey") % 4 =!= 0)
          .repartition(4), base, statsKey = Some("o_orderkey"))
        val built = Snapshots.writeQuantileSidecars(s, base,
          Seq("o_totalprice"), kSize = 2000)
        // fresh append WITHOUT sidecars: the estimate must still cover it
        // (hybrid delta scan)
        Snapshots.append(orders.filter(col("o_orderkey") % 4 === 0), base)
        val Seq(p50, p90) = Snapshots.approxQuantiles(s, base,
          "o_totalprice", Seq(0.5, 0.9), kSize = 2000)
        // exact ranks of the estimates over the SAME logical table
        val n = orders.count().toDouble
        val r50 = orders.filter(col("o_totalprice") <= p50).count() / n
        val r90 = orders.filter(col("o_totalprice") <= p90).count() / n
        T(s, d, "orders")
          .agg(count(lit(1)).as("n_orders"))
          .select(col("n_orders"),
            lit(built.toLong).as("n_sidecars"),
            (abs(lit(r50) - 0.5) <= 0.02).as("p50_rank_ok"),
            (abs(lit(r90) - 0.9) <= 0.02).as("p90_rank_ok"),
            (lit(p50) < lit(p90)).as("monotone"))
      },
      Some("""SELECT count(*) AS n_orders, 4 AS n_sidecars,
             |  TRUE AS p50_rank_ok, TRUE AS p90_rank_ok, TRUE AS monotone
             |FROM orders""".stripMargin)),

    // Filtered metadata top-k (round-15): ORDER BY ... WHERE ... LIMIT k
    // planned from file bounds — the WHERE prunes the candidate pool
    // through the unified planner BEFORE bound ranking, so the query
    // reads the predicate range's best files, never the global top, and
    // the residual conjunct (key % 3 = 0, invisible to bounds) filters
    // rows without poisoning the k-th threshold. The counting-FS pin
    // lives in Round15StoreSpec.
    "snap_topk_where" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snaptkw")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        Snapshots.write(orders.repartitionByRange(6, col("o_orderkey")),
          base, statsKey = Some("o_orderkey"))
        Snapshots.topK(s, base, "o_orderkey", 15,
            where = Some(col("o_orderkey") <= 30000L &&
              col("o_orderkey") % 3 === 0))
          .select(col("o_orderkey"),
            col("o_totalprice").cast("double").as("price"))
      },
      Some("""SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
             |FROM orders WHERE o_orderkey <= 30000 AND o_orderkey % 3 = 0
             |ORDER BY o_orderkey DESC LIMIT 15""".stripMargin)),

    // NDV sketch sidecars (round-14): per-file mergeable HLLs — Iceberg's
    // puffin NDV sketches in miniature. One build job over the sidecar-
    // less files, then "how many distinct customers" answers from
    // METADATA (zero records read once covered — the IO pin lives in
    // SnapshotsSpec; fresh appends pay a delta-only hybrid scan). The
    // low-cardinality estimate is exact (HLL is exact far below 2^lgK);
    // the high-cardinality one is pinned within 5% (lgK=14 ≈ 0.4% rsd —
    // estimates never cross engines, the a12 pattern).
    "snap_ndv" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapndv")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
        Snapshots.write(orders.repartition(4), base)
        val built = Snapshots.writeNdvSidecars(s, base,
          Seq("o_custkey", "o_orderpriority"), lgK = 14)
        val custEst = Snapshots.approxDistinct(s, base, "o_custkey")
        val prioEst = Snapshots.approxDistinct(s, base, "o_orderpriority")
        T(s, d, "orders")
          .agg(countDistinct(col("o_custkey")).as("exact_cust"))
          .select(lit(built.toLong).as("n_sidecars"),
            (abs(lit(custEst) - col("exact_cust")) <=
              col("exact_cust") * 0.05).as("cust_within_5pct"),
            lit(prioEst).as("prio_ndv"))
      },
      Some("""SELECT 4 AS n_sidecars, TRUE AS cust_within_5pct,
             |  (SELECT count(DISTINCT o_orderpriority) FROM orders)
             |    AS prio_ndv""".stripMargin)),

    // Column RENAME evolution (round-14; the ADD-column path is
    // snap_schema_evolve): a metadata-only commit — zero data moves, old
    // files keep their physical name and coalesce into the logical column
    // at read, new appends carry the new name, time travel sees the
    // schema AS OF the version, and the pre-rename manifest stats keep
    // pruning new-name scans through the translation layer.
    // materializeSchema then rewrites ONLY the stale-shape files (the
    // post-rename append is inherited by reference) and the read is
    // bit-identical before and after. The guard matrix (rewrite verbs
    // refuse while ops pend, name-reuse quarantine) lives in
    // SnapshotsSpec.
    "snap_rename_col" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapschevo")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(
          docs.filter(col("doc_id") % 2 === 0)
            .repartitionByRange(4, col("n_chars"), col("doc_id")),
          base, statsKey = Some("n_chars"))
        Snapshots.renameColumn(s, base, "n_chars", "chars")
        Snapshots.append(docs.filter(col("doc_id") % 2 === 1)
          .withColumnRenamed("n_chars", "chars"), base)
        val oldNameAtV1 =
          Snapshots.read(s, base, Some(1L)).columns.contains("n_chars")
        // pre-rename stats prune a NEW-name range scan (translation)
        val (cand, pruned) = Snapshots.scanPlan(s, base, col("chars") <= 300L)
        val nLow = Snapshots.countWhere(s, base, col("chars") <= 300L)
        val preFiles = Snapshots.manifestFiles(s, base,
          Snapshots.versions(s, base).last).toSet
        Snapshots.materializeSchema(s, base, statsKey = Some("chars"))
        val postFiles = Snapshots.manifestFiles(s, base,
          Snapshots.versions(s, base).last).toSet
        val partialRewrite = (preFiles intersect postFiles).nonEmpty &&
          (preFiles -- postFiles).nonEmpty
        Snapshots.read(s, base)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), dsum(col("chars")).as("sum_chars"))
          .withColumn("old_name_at_v1", lit(oldNameAtV1))
          .withColumn("pruned_some", lit(pruned.nonEmpty && cand.nonEmpty))
          .withColumn("n_low", lit(nLow))
          .withColumn("partial_rewrite", lit(partialRewrite))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n,
             |  CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS sum_chars,
             |  TRUE AS old_name_at_v1, TRUE AS pruned_some,
             |  (SELECT count(*) FROM documents WHERE n_chars <= 300) AS n_low,
             |  TRUE AS partial_rewrite
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Metadata-assisted top-k (round-14): ORDER BY … LIMIT k planned from
    // per-file bounds — files that cannot beat the k-th value found so
    // far are never opened, so "top spenders" over a value-clustered
    // 100 TB table reads one file where TakeOrderedAndProject scans all.
    // Both directions exercised; the oracle is the plain order-limit
    // (ties broken by key, NULLs-last matching Spark's default); the
    // records-read proof lives in SnapshotsSpec.
    "snap_topk" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snaptopk")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Snapshots.write(orders.repartitionByRange(8, col("o_totalprice")),
          base, statsKey = Some("o_totalprice"))
        val hi = Snapshots.topK(s, base, "o_totalprice", 15,
            tieBreak = Seq("o_orderkey"))
          .withColumn("dir", lit("hi"))
        val lo = Snapshots.topK(s, base, "o_totalprice", 15,
            tieBreak = Seq("o_orderkey"), ascending = true)
          .withColumn("dir", lit("lo"))
        hi.unionByName(lo)
          .select(col("dir"), col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").cast("double").as("price"))
          .orderBy(col("dir"), col("price"), col("o_orderkey"))
      },
      Some("""WITH hi AS (
             |  SELECT 'hi' AS dir, o_orderkey, o_orderstatus,
             |         CAST(o_totalprice AS DOUBLE) AS price
             |  FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15),
             |lo AS (
             |  SELECT 'lo' AS dir, o_orderkey, o_orderstatus,
             |         CAST(o_totalprice AS DOUBLE) AS price
             |  FROM orders ORDER BY o_totalprice ASC, o_orderkey LIMIT 15)
             |SELECT * FROM (SELECT * FROM hi UNION ALL SELECT * FROM lo)
             |ORDER BY dir, price, o_orderkey""".stripMargin)),

    // Timestamp-bounds file pruning (round-14): event-time range scans are
    // THE canonical 100 TB filter — the fixture time-clusters events and
    // records timestamp stats in the manifest. The canon is Catalyst's
    // internal value space (epoch MICROS — what a predicate Literal
    // stringifies to), never the session-TZ rendering, so bounds and
    // literals compare in one number space. A two-day head scan must
    // provably skip files (pruned_some) and a mid-month countWhere must
    // stay exact; both replay against the oracle's plain filters.
    "snap_ts_prune" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snaptsp")
        val base = root + "/t"
        val ev = TestData.events(s, d)
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        Snapshots.write(ev.repartitionByRange(8, col("ts")), base,
          statsKey = Some("ts"))
        val pred =
          col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))
        val (cand, pruned) = Snapshots.scanPlan(s, base, pred)
        val nWin = Snapshots.countWhere(s, base,
          col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) &&
            col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-12 00:00:00")))
        Snapshots.scanWhere(s, base, pred)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
          .withColumn("pruned_some", lit(pruned.nonEmpty && cand.nonEmpty))
          .withColumn("n_window", lit(nWin))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             |  TRUE AS pruned_some,
             |  (SELECT count(*) FROM events
             |     WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
             |       AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-12 00:00:00')
             |    AS n_window
             |FROM events
             |WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-03 00:00:00'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Streaming MV end-to-end (round-14): the exactly-once
    // stream→source→view chain as an oracle key — MatView.ingestAndRefresh
    // under the at-least-once hazards a real stream delivers. Batch 1
    // CRASHES between the source append and the view refresh (simulated
    // by a bare appendStream); its redelivery must no-op the append
    // (idempotent on (appId, batchId)) while the refresh folds the whole
    // backlog. Batch 2 is then fully REPLAYED after success — no-op on
    // both tables (replay_noop pins it). The final view must equal the
    // full recompute the oracle runs, anchored at the last source version.
    "snap_mv_stream" -> Q(
      (s, d) => {
        import graft.store.{MatView, Snapshots}
        val root = FixtureRoot.fresh("snapmvstream")
        val (base, mv) = (root + "/t", root + "/mv")
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        def slice(i: Int) = orders.filter(pmod(col("o_orderkey"), lit(4)) === i)
        val grp = Seq("o_orderpriority")
        Snapshots.write(slice(0), base)
        MatView.create(s, base, mv, grp, "o_totalprice")
        // batch 0: the happy path — exactly-once append + O(delta) refresh
        MatView.ingestAndRefresh(slice(1), 0L, base, mv, grp,
          "o_totalprice", "mvstream")
        // batch 1: crash AFTER the source append, BEFORE the refresh …
        Snapshots.appendStream(slice(2), base, "mvstream", 1L)
        // … restart redelivers it: the append no-ops, the refresh folds
        // the backlog — the view never double-counts batch 1
        MatView.ingestAndRefresh(slice(2), 1L, base, mv, grp,
          "o_totalprice", "mvstream")
        // batch 2: delivered, then fully replayed — no-op on BOTH tables
        MatView.ingestAndRefresh(slice(3), 2L, base, mv, grp,
          "o_totalprice", "mvstream")
        val (nSrc, nMv) =
          (Snapshots.versions(s, base).size, Snapshots.versions(s, mv).size)
        MatView.ingestAndRefresh(slice(3), 2L, base, mv, grp,
          "o_totalprice", "mvstream")
        val replayNoop = Snapshots.versions(s, base).size == nSrc &&
          Snapshots.versions(s, mv).size == nMv
        Snapshots.read(s, mv)
          .select(col("o_orderpriority"), col("n"),
            col("total").cast("double").as("total"),
            col(MatView.SrcVersionCol).as("src_version"))
          .withColumn("replay_noop", lit(replayNoop))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  4 AS src_version, TRUE AS replay_noop
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Type-widening evolution (round-15; the third evolution verb after
    // r14's rename/drop): `W:` manifest op, metadata-only — files of the
    // int vintage stay physically narrow and the parquet reader upcasts
    // them under the recorded-schema union (Spark 4's widening read path);
    // post-widen appends land wide; time travel sees int AS OF v1; stats
    // keep pruning across the widening (the lattice never crosses a type
    // tag); materializeSchema then rewrites ONLY the narrow-vintage files
    // (type-exact staleness from the per-file recorded schemas) and folds
    // the op away. Guard matrix (rewrite verbs refuse while the op pends,
    // no mixing with rename/drop) lives in SchemaWidenSpec.
    "snap_type_widen" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        import org.apache.spark.sql.types.{IntegerType, LongType}
        val root = FixtureRoot.fresh("snapwiden")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(
          docs.filter(col("doc_id") % 2 === 0)
            .withColumn("n_chars", col("n_chars").cast("int"))
            .repartitionByRange(4, col("n_chars"), col("doc_id")),
          base, statsKey = Some("n_chars"))
        val intAtV1 =
          Snapshots.read(s, base).schema("n_chars").dataType == IntegerType
        Snapshots.widenColumn(s, base, "n_chars", LongType)
        Snapshots.append(docs.filter(col("doc_id") % 2 === 1), base,
          statsKey = Some("n_chars"))
        val longNow =
          Snapshots.read(s, base).schema("n_chars").dataType == LongType &&
            Snapshots.read(s, base, Some(1L))
              .schema("n_chars").dataType == IntegerType
        // int-vintage stats prune a long-literal range scan (tag L spans
        // the widening)
        val (cand, pruned) = Snapshots.scanPlan(s, base, col("n_chars") <= 300L)
        val nLow = Snapshots.countWhere(s, base, col("n_chars") <= 300L)
        val preFiles = Snapshots.manifestFiles(s, base,
          Snapshots.versions(s, base).last).toSet
        Snapshots.materializeSchema(s, base, statsKey = Some("n_chars"))
        val postFiles = Snapshots.manifestFiles(s, base,
          Snapshots.versions(s, base).last).toSet
        val partialRewrite = (preFiles intersect postFiles).nonEmpty &&
          (preFiles -- postFiles).nonEmpty
        Snapshots.read(s, base)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), dsum(col("n_chars")).as("sum_chars"))
          .withColumn("int_at_v1", lit(intAtV1))
          .withColumn("long_now", lit(longNow))
          .withColumn("pruned_some", lit(pruned.nonEmpty && cand.nonEmpty))
          .withColumn("n_low", lit(nLow))
          .withColumn("partial_rewrite", lit(partialRewrite))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n,
             |  CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS sum_chars,
             |  TRUE AS int_at_v1, TRUE AS long_now, TRUE AS pruned_some,
             |  (SELECT count(*) FROM documents WHERE n_chars <= 300) AS n_low,
             |  TRUE AS partial_rewrite
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Generalized metadata MIN/MAX (round-15): metaBoundsOf answers on a
    // NON-manifest-key column from the multi-column stats sidecars — the
    // same composed lookup the unified scan planner prunes with — with
    // zero records read (the IO pin lives in Round15StoreSpec). A column
    // without sidecar coverage soundly returns None instead of guessing.
    "snap_meta_minmax" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapmmx")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(docs.repartition(4), base, statsKey = Some("doc_id"))
        Snapshots.writeStatsSidecars(s, base, Seq("n_chars"))
        val Some((mn, mx)) = Snapshots.metaBoundsOf(s, base, "n_chars")
        val uncovered = Snapshots.metaBoundsOf(s, base, "source").isEmpty
        import s.implicits._
        Seq((mn.toLong, mx.toLong, uncovered))
          .toDF("min_chars", "max_chars", "none_without_sidecar")
      },
      Some("""SELECT min(n_chars) AS min_chars, max(n_chars) AS max_chars,
             |  TRUE AS none_without_sidecar FROM documents""".stripMargin)),

    // NDV under pending MoR deletes (round-15): the hybrid approxDistinct
    // no longer forces a full re-scan when deletes pend — it re-scans only
    // files the deletes COVER and keeps untouched files' sketches (the
    // records-read pin lives in Round15StoreSpec); this key pins the
    // VALUE: deleting every key ≡ 0 (mod 4) removes exactly the residues
    // ≡ 0 (mod 4) of `o_orderkey % 120`, so the post-delete NDV is an
    // exact, SQL-checkable 90-of-120 drop (120 distincts sit far inside
    // HLL's exact sparse range).
    "snap_ndv_mor" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapndvmor")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), (col("o_orderkey") % 120).as("bucket"))
        Snapshots.write(orders.repartitionByRange(4, col("o_orderkey")),
          base, statsKey = Some("o_orderkey"))
        Snapshots.writeNdvSidecars(s, base, Seq("bucket"))
        val before = Snapshots.approxDistinct(s, base, "bucket")
        Snapshots.deleteWhereMoR(s, base, col("o_orderkey") % 4 === 0)
        val after = Snapshots.approxDistinct(s, base, "bucket")
        import s.implicits._
        Seq((before, after)).toDF("ndv_before", "ndv_after")
      },
      Some("""SELECT
             |  (SELECT count(DISTINCT o_orderkey % 120) FROM orders)
             |    AS ndv_before,
             |  (SELECT count(DISTINCT o_orderkey % 120) FROM orders
             |   WHERE o_orderkey % 4 <> 0) AS ndv_after""".stripMargin)),

    // ADD COLUMN evolution (round-15; completes the DDL family with
    // rename/drop/widen): `A:` metadata-only op — the column appears
    // null-filled on every pre-existing file with zero data moves, appends
    // physicalize it at the declared type, time travel doesn't see it, and
    // — unlike rename/drop/widen — DML proceeds while the op pends (the
    // update below runs BEFORE any materialize). The oracle replays the
    // whole lifecycle relationally.
    "snap_add_col" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        import org.apache.spark.sql.types.DoubleType
        val root = FixtureRoot.fresh("snapaddcol")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(
          docs.filter(col("doc_id") % 2 === 0)
            .repartitionByRange(4, col("doc_id")),
          base, statsKey = Some("doc_id"))
        Snapshots.addColumn(s, base, "score", DoubleType)
        val absentAtV1 =
          !Snapshots.read(s, base, Some(1L)).columns.contains("score")
        // post-add appends carry the column physically …
        Snapshots.append(docs.filter(col("doc_id") % 2 === 1)
          .withColumn("score", col("n_chars").cast("double") / 100.0),
          base, statsKey = Some("doc_id"))
        // … and DML runs while the op pends (no materialize needed):
        // backfill the old vintage's low ids
        Snapshots.updateWhere(s, base,
          col("doc_id") % 2 === 0 && col("doc_id") < 100,
          Seq("score" -> lit(1.0)))
        Snapshots.read(s, base)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            count(col("score")).as("n_scored"),
            dsum(coalesce(col("score"), lit(0.0))).as("sum_score"))
          .withColumn("absent_at_v1", lit(absentAtV1))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n,
             |  count(CASE WHEN doc_id % 2 = 1 THEN 1
             |             WHEN doc_id % 2 = 0 AND doc_id < 100 THEN 1 END)
             |    AS n_scored,
             |  CAST(sum(CAST(
             |    CASE WHEN doc_id % 2 = 1 THEN n_chars / 100.0
             |         WHEN doc_id % 2 = 0 AND doc_id < 100 THEN 1.0
             |         ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS sum_score,
             |  TRUE AS absent_at_v1
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Hidden partitioning: the bucket transform (round-15). Iceberg's
    // `bucket(n, col)` re-expressed on Spark's own bucketBy layout: the
    // manifest records `B:<col>\t<n>`, each file's bucket id rides its
    // bucket file name, and scanPlan prunes equality/IN probes on the
    // bucket column to 1/n of the files FROM METADATA — the point-lookup
    // win min/max bounds can never give an UNSORTED high-cardinality key.
    // The fixture buckets orders by o_custkey (statsKey deliberately a
    // DIFFERENT column, so bounds contribute nothing and the prune is
    // purely bucket-driven) and probes the two extreme customers; at 16
    // buckets the 2-value probe must skip ≥14 files (pruned_some pins it;
    // the files-opened proof lives in BucketLayoutSpec).
    "snap_bucket_prune" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapbktp")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        Snapshots.writeBucketed(orders, base, "o_custkey", 16,
          statsKey = Some("o_orderkey"))
        val mm = orders.agg(min(col("o_custkey")), max(col("o_custkey"))).head()
        val (kLo, kHi) = (mm.getLong(0), mm.getLong(1))
        val pred = col("o_custkey") === kLo || col("o_custkey") === kHi
        val (cand, pruned) = Snapshots.scanPlan(s, base, pred)
        Snapshots.scanWhere(s, base, pred)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("pruned_some", lit(pruned.size >= cand.size))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |    AS total,
             |  TRUE AS pruned_some
             |FROM orders
             |WHERE o_custkey = (SELECT min(o_custkey) FROM orders)
             |   OR o_custkey = (SELECT max(o_custkey) FROM orders)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Storage-partitioned join (round-15): two tables written bucketed by
    // the SAME (key, n) spec are registered as catalog bucketed tables and
    // joined with ZERO exchanges below the join — each FileSourceScan
    // reports HashPartitioning(key, n), so the sort-merge join's children
    // are co-partitioned at the storage layer. This is THE answer to the
    // single biggest shuffle of a pretraining pipeline: joining two
    // ~100 TB fact tables (docs × annotations on doc_id) moves ZERO bytes
    // over the network when both were laid out bucketed at write time.
    // The `copartitioned` boolean pins the property: planned with the
    // broadcast shortcut disabled, the join tree carries NO Exchange
    // (execution afterwards runs under the session's normal confs — at
    // oracle SF the small side may well broadcast, which is also
    // shuffle-free). The hard plan pin lives in BucketLayoutSpec.
    "snap_bucket_join" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapbktj")
        val (bc, bo) = (root + "/c", root + "/o")
        val cust = T(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        val orders = T(s, d, "orders")
          .select(col("o_custkey"), col("o_totalprice"))
        Snapshots.writeBucketed(cust, bc, "c_custkey", 8,
          statsKey = Some("c_custkey"))
        Snapshots.writeBucketed(orders, bo, "o_custkey", 8,
          statsKey = Some("o_custkey"))
        val tag = math.abs(root.hashCode).toString
        val l = Snapshots.bucketedTable(s, bc, s"graft_bkt_c_$tag")
        val r = Snapshots.bucketedTable(s, bo, s"graft_bkt_o_$tag")
        val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try {
          s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
          val joined = l.join(r, l("c_custkey") === r("o_custkey"))
          // copartitioned: the planned join needs no Exchange anywhere in
          // the join tree (the agg above it is allowed its own shuffle)
          val copart = !joined.queryExecution.executedPlan.toString
            .contains("Exchange")
          joined.groupBy(col("c_mktsegment"))
            .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
            .withColumn("copartitioned", lit(copart))
            .orderBy(col("c_mktsegment"))
        } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |    AS total,
             |  TRUE AS copartitioned
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // REPLACE WHERE (round-15): Delta's replaceWhere / Iceberg's dynamic
    // overwrite as ONE commit — the backfill idiom. Recompute the low-key
    // range (here: negate its totalprice) and swap it in atomically;
    // discovery is bounds-pruned, touched files rewrite copy-on-write at
    // file granularity, clean files inherit by reference (files_shared
    // pins it — at 100 TB a one-partition backfill must not touch the
    // other 10k partitions' files), and no reader can ever see the
    // delete-then-insert gap because both halves land in one rename.
    "snap_replace_where" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snaprw")
        val base = root + "/t"
        val orders = T(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Snapshots.write(orders.repartitionByRange(6, col("o_orderkey")), base,
          statsKey = Some("o_orderkey"))
        val vBefore = Snapshots.versions(s, base).last
        val repl = orders.filter(col("o_orderkey") < 1000)
          .withColumn("o_totalprice", -col("o_totalprice"))
        Snapshots.replaceWhere(s, base, col("o_orderkey") < 1000, repl,
          statsKey = Some("o_orderkey"))
        def paths(v: Long): Set[String] = Snapshots.files(s, base, Some(v))
          .select(col("path")).collect().map(_.getString(0)).toSet
        val shared = (paths(vBefore) intersect paths(vBefore + 1)).nonEmpty
        Snapshots.read(s, base)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .withColumn("files_shared", lit(shared))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(CASE WHEN o_orderkey < 1000
             |    THEN -o_totalprice ELSE o_totalprice END
             |    AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  TRUE AS files_shared
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // CHECK constraints (round-15): Delta table constraints in miniature.
    // Declared metadata-only after a one-time full validation; every later
    // commit's STAGED rows are checked BEFORE the atomic rename, so a
    // poisoned batch never becomes a version — at 100 TB the write-time
    // gate costs a delta-sized scan where the alternative (discovering
    // poisoned rows after they joined the corpus) costs a reprocessing
    // campaign. The violating append here must refuse WITHOUT creating a
    // version (refused_clean pins both halves); the clean append passes.
    "snap_constraint" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapck")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(docs.repartitionByRange(4, col("doc_id")), base,
          statsKey = Some("doc_id"))
        Snapshots.addConstraint(s, base, "chars_nonneg", "n_chars >= 0")
        val vBefore = Snapshots.versions(s, base).last
        import s.implicits._
        val refused =
          try {
            Snapshots.append(
              Seq((2000000000L, "zzz", -1L)).toDF("doc_id", "source", "n_chars"),
              base, statsKey = Some("doc_id"))
            false
          } catch { case _: Snapshots.ConstraintViolationException => true }
        val clean = refused && Snapshots.versions(s, base).last == vBefore
        Snapshots.append(
          docs.filter(col("doc_id") % 97 === 0)
            .withColumn("doc_id", col("doc_id") + 1000000000L)
            .withColumn("source", lit("extra")),
          base, statsKey = Some("doc_id"))
        Snapshots.read(s, base)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), dsum(col("n_chars")).as("sum_chars"))
          .withColumn("refused_clean", lit(clean))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
             |  SELECT source, n_chars FROM documents
             |  UNION ALL
             |  SELECT 'extra' AS source, n_chars FROM documents
             |  WHERE doc_id % 97 = 0)
             |SELECT source, count(*) AS n,
             |  CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_chars,
             |  TRUE AS refused_clean
             |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ADD COLUMN ... DEFAULT (round-15; Iceberg v3 default values): the
    // default is a constant SQL expression applied at read to every row
    // whose FILE's recorded schema lacks the column — pre-add vintages AND
    // post-add appends that omitted it (initial-default and write-default
    // collapse into one file-granular rule, decided from the manifest's
    // per-file schemas). Zero rewrites: declaring a default on a 100 TB
    // table is one metadata line; carriers' real values — including
    // explicit NULLs — pass through untouched. The fixture layers all
    // three vintages: pre-add files (default), a carrier append (real
    // scores), and an omitting append (default again).
    "snap_default_col" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        import org.apache.spark.sql.types.DoubleType
        val root = FixtureRoot.fresh("snapdflt")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(
          docs.filter(col("doc_id") % 2 === 0)
            .repartitionByRange(4, col("doc_id")),
          base, statsKey = Some("doc_id"))
        Snapshots.addColumn(s, base, "score", DoubleType, Some("0.25"))
        val v1Absent =
          !Snapshots.read(s, base, Some(1L)).columns.contains("score")
        // carrier vintage: real values ride the append
        Snapshots.append(docs.filter(col("doc_id") % 2 === 1)
          .withColumn("score", col("n_chars").cast("double") / 100.0),
          base, statsKey = Some("doc_id"))
        // omitting vintage: the writer never mentions the column —
        // write-default fills it, same file-granular rule
        Snapshots.append(docs.filter(col("doc_id") % 103 === 0)
          .withColumn("doc_id", col("doc_id") + 2000000000L)
          .withColumn("source", lit("extra")),
          base, statsKey = Some("doc_id"))
        Snapshots.read(s, base)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            count(col("score")).as("n_scored"),
            dsum(col("score")).as("sum_score"))
          .withColumn("v1_absent", lit(v1Absent))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
             |  SELECT source,
             |    CASE WHEN doc_id % 2 = 0 THEN 0.25
             |         ELSE n_chars / 100.0 END AS score
             |  FROM documents
             |  UNION ALL
             |  SELECT 'extra' AS source, 0.25 AS score FROM documents
             |  WHERE doc_id % 103 = 0)
             |SELECT source, count(*) AS n, count(score) AS n_scored,
             |  CAST(sum(CAST(score AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_score,
             |  TRUE AS v1_absent
             |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Table-as-stream source (round-16): the snapshot store as a
    // Structured Streaming SOURCE (graft.store.SnapshotStreamSource, a
    // DSv2 MicroBatchStream — offsets are version numbers, a micro-batch
    // is the manifest delta's added files, O(delta) planned). Pins the
    // full consumer lifecycle: three commits stream as three
    // version-paced micro-batches (maxVersionsPerTrigger=1 admission
    // control under Trigger.AvailableNow), a caught-up restart of the
    // same checkpoint delivers NOTHING (exactly-once replay from the
    // committed-manifest model), a commit made while the stream is down
    // arrives as exactly one incremental batch on restart, and the
    // streamed union equals the batch read of the final version — the
    // oracle's full-table aggregate.
    "snap_stream_source" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        import org.apache.spark.sql.streaming.Trigger
        val root = FixtureRoot.fresh("snapstreamsrc")
        val (base, sink) = (root + "/t", root + "/sink")
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        def slice(i: Int) = docs.filter(pmod(col("doc_id"), lit(4)) === i)
        Snapshots.write(slice(0), base)
        Snapshots.append(slice(1), base)
        Snapshots.append(slice(2), base)
        // one AvailableNow catch-up run; returns its micro-batch count
        def drain(): Long = {
          var batches = 0L
          val q = s.readStream.format("graft-snapshots")
            .option("maxVersionsPerTrigger", "1")
            .load(base)
            .writeStream
            .option("checkpointLocation", root + "/ckpt")
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, _: Long) =>
              batches += 1
              b.write.mode("append").parquet(sink)
              ()
            }
            .start()
          q.awaitTermination()
          batches
        }
        val firstBatches = drain() // 3 commits → 3 paced micro-batches
        val replayNoop = drain() == 0L // caught-up restart: no redelivery
        Snapshots.append(slice(3), base) // committed while the stream is down
        val incrBatches = drain() // resumes at the checkpointed version
        s.read.parquet(sink)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), dsum(col("n_chars")).as("sum_chars"))
          .withColumn("first_batches", lit(firstBatches))
          .withColumn("replay_noop", lit(replayNoop))
          .withColumn("incr_batches", lit(incrBatches))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n,
             |  CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS sum_chars,
             |  3 AS first_batches, TRUE AS replay_noop, 1 AS incr_batches
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Branch streaming (round-16): the stream source scoped to a BRANCH's
    // commit chain (option("branch") — Iceberg's branch reads, streamed):
    // the WAP shape where an audit subscriber follows a staging branch
    // while main evolves independently. The oracle replays the branch
    // lineage relationally: forked slice + branch appends, with the
    // main-only slice provably absent from the feed.
    "snap_stream_branch" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        import org.apache.spark.sql.streaming.Trigger
        val root = FixtureRoot.fresh("snapstreambr")
        val (base, sink) = (root + "/t", root + "/sink")
        val docs = T(s, d, "documents").select(col("doc_id"), col("n_chars"))
        Snapshots.write(docs.filter(col("doc_id") % 4 === 0), base)
        Snapshots.createBranch(s, base, "staging", 1L)
        Snapshots.appendBranch(docs.filter(col("doc_id") % 4 === 1),
          base, "staging")
        // main moves on independently — this slice must NOT reach the feed
        Snapshots.append(docs.filter(col("doc_id") % 4 === 2), base)
        Snapshots.appendBranch(docs.filter(col("doc_id") % 4 === 3),
          base, "staging")
        def drain(): Long = {
          var batches = 0L
          val q = s.readStream.format("graft-snapshots")
            .option("branch", "staging")
            .option("maxVersionsPerTrigger", "1")
            .load(base)
            .writeStream
            .option("checkpointLocation", root + "/ckpt")
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, _: Long) =>
              batches += 1
              b.write.mode("append").parquet(sink)
              ()
            }
            .start()
          q.awaitTermination()
          batches
        }
        val nBatches = drain() // fork + 2 branch appends = 3 paced batches
        val replayNoop = drain() == 0L
        s.read.parquet(sink)
          .groupBy((col("doc_id") % 4).as("residue"))
          .agg(count(lit(1)).as("n"), dsum(col("n_chars")).as("sum_chars"))
          .withColumn("n_batches", lit(nBatches))
          .withColumn("replay_noop", lit(replayNoop))
          .orderBy(col("residue"))
      },
      Some("""SELECT doc_id % 4 AS residue, count(*) AS n,
             |  CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS sum_chars,
             |  3 AS n_batches, TRUE AS replay_noop
             |FROM documents WHERE doc_id % 4 <> 2
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SUM/AVG aggregate pushdown (round-16 continuation): exact per-file
    // `.sums` sidecars (Σ value + non-null count in decimal(38,scale) —
    // exact and associative) let SnapshotAggRewrite fold SUM and AVG
    // from metadata, with the non-negativity proof (metadata min ≥ 0 ⇒
    // monotone partials ⇒ no overflow/throw in any eval mode) checked
    // before rewriting. The metadata_answered pin asserts the statement
    // planned as LocalTableScan; zero-IO and hybrid/decline matrices
    // live in SnapshotAggRewriteSpec.
    "snap_sum_pushdown" -> Q(
      (s, d) => {
        import graft.plans.SnapshotAggRewrite
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapsumpd")
        val base = root + "/t"
        // a SIGNED column rides along (round-17): non-negativity cannot
        // admit it; the metaAbsSumBound |partial-sum| proof does
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("n_chars"),
            (col("n_chars") - lit(3000L)).as("delta"))
        Snapshots.write(docs.repartitionByRange(4, col("doc_id")), base,
          statsKey = Some("doc_id"))
        Snapshots.writeSumSidecars(s, base, Seq("n_chars", "delta"))
        Snapshots.writeStatsSidecars(s, base, Seq("n_chars", "delta"))
        Snapshots.read(s, base).createOrReplaceTempView("snap_sum_pd_v")
        AggRule.withEnabled(s) {
          val q = s.sql(
            """SELECT sum(n_chars) AS sum_chars, avg(n_chars) AS avg_raw,
              |  sum(delta) AS sum_delta, count(*) AS n
              |FROM snap_sum_pd_v""".stripMargin)
          val answered = q.queryExecution.executedPlan.collectFirst {
            case l: org.apache.spark.sql.execution.LocalTableScanExec => l
          }.nonEmpty
          val r = q.collect().head
          val avg6 = BigDecimal(r.getDouble(1))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          import s.implicits._
          Seq((r.getLong(0), avg6, r.getLong(2), r.getLong(3), answered))
            .toDF("sum_chars", "avg_chars", "sum_delta", "n",
              "metadata_answered")
        }
      },
      Some("""SELECT CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  round(avg(n_chars), 6) AS avg_chars,
             |  CAST(sum(n_chars - 3000) AS BIGINT) AS sum_delta,
             |  count(*) AS n, TRUE AS metadata_answered
             |FROM documents""".stripMargin)),

    // Change-data-feed streaming (round-16, Delta CDF streaming twin):
    // option("readChangeFeed", true) turns the table-as-stream source
    // into a CDC subscription — each micro-batch is the O(delta)
    // Snapshots.changes feed over its version range (insert / delete /
    // update pre+post pairs + _commit_version), the initial snapshot
    // arrives as inserts, and the append-only contract does not apply
    // (rewrites are exactly what the feed describes). The oracle replays
    // the full four-commit lifecycle relationally: initial inserts, a
    // CoW update's pairs, a delete carrying the post-update image, and
    // an appended slice's inserts.
    "snap_stream_cdf" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        import org.apache.spark.sql.streaming.Trigger
        val root = FixtureRoot.fresh("snapstreamcdf")
        val (base, sink) = (root + "/t", root + "/sink")
        val docs = T(s, d, "documents").select(col("doc_id"), col("n_chars"))
        Snapshots.write(docs.filter(col("doc_id") % 3 === 0), base)
        Snapshots.updateWhere(s, base, col("doc_id") % 15 === 0,
          Seq("n_chars" -> (col("n_chars") + 1000L)))
        Snapshots.deleteWhere(s, base, col("doc_id") % 21 === 0)
        Snapshots.append(docs.filter(col("doc_id") % 3 === 1), base)
        def drain(): Long = {
          var batches = 0L
          val q = s.readStream.format("graft-snapshots")
            .option("readChangeFeed", "true")
            .option("changeKey", "doc_id")
            .option("maxVersionsPerTrigger", "1")
            .load(base)
            .writeStream
            .option("checkpointLocation", root + "/ckpt")
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, _: Long) =>
              batches += 1
              b.write.mode("append").parquet(sink)
              ()
            }
            .start()
          q.awaitTermination()
          batches
        }
        val nBatches = drain() // 4 commits → 4 paced CDC micro-batches
        val replayNoop = drain() == 0L
        s.read.parquet(sink)
          .groupBy(col("_change_type").as("change_type"))
          .agg(count(lit(1)).as("n"), dsum(col("n_chars")).as("sum_chars"))
          .withColumn("n_batches", lit(nBatches))
          .withColumn("replay_noop", lit(replayNoop))
          .orderBy(col("change_type"))
      },
      Some("""WITH base3 AS (
             |  SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 = 0),
             |feed AS (
             |  SELECT 'insert' AS ct, n_chars AS x FROM base3
             |  UNION ALL
             |  SELECT 'update_preimage', n_chars FROM base3 WHERE doc_id % 15 = 0
             |  UNION ALL
             |  SELECT 'update_postimage', n_chars + 1000 FROM base3
             |  WHERE doc_id % 15 = 0
             |  UNION ALL
             |  SELECT 'delete',
             |    CASE WHEN doc_id % 15 = 0 THEN n_chars + 1000 ELSE n_chars END
             |  FROM base3 WHERE doc_id % 21 = 0
             |  UNION ALL
             |  SELECT 'insert', n_chars FROM documents WHERE doc_id % 3 = 1)
             |SELECT ct AS change_type, count(*) AS n,
             |  CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sum_chars,
             |  4 AS n_batches, TRUE AS replay_noop
             |FROM feed GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Grouped aggregate pushdown on the cluster key (round-17): when
    // per-file bounds of the grouping column prove files SINGLE-GROUP
    // (min == max, zero nulls), GROUP BY k -> COUNT/SUM/MIN/MAX folds
    // from manifests + sidecars, scanning only files that straddle group
    // borders — the ad-hoc per-source rollup a clustered 100 TB table
    // answers almost for free (the MV answers the MAINTAINED rollup;
    // this answers the one nobody pre-declared). The only-boundary-files
    // proof lives in SnapshotAggRewriteSpec; here the pin is
    // metadata_answered + exact parity with the oracle's rollup.
    "snap_group_pushdown" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapgrouppd")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        // cluster on source: HASH repartition isolates each source in
        // one file (the few hash-collision files scan as boundary), plus
        // one deliberately mixed straddler commit
        Snapshots.write(docs.filter(col("doc_id") % 5 =!= 0)
            .repartition(24, col("source")), base,
          statsKey = Some("source"))
        Snapshots.append(docs.filter(col("doc_id") % 5 === 0).coalesce(1),
          base, statsKey = Some("source"))
        Snapshots.writeStatsSidecars(s, base, Seq("n_chars"))
        Snapshots.writeSumSidecars(s, base, Seq("n_chars"))
        Snapshots.read(s, base).createOrReplaceTempView("snap_group_pd_v")
        AggRule.withEnabled(s) {
          val q = s.sql(
            """SELECT source, count(*) AS n, sum(n_chars) AS sum_chars,
              |  min(n_chars) AS mn_chars, max(n_chars) AS mx_chars
              |FROM snap_group_pd_v GROUP BY source""".stripMargin)
          val answered = q.queryExecution.executedPlan.collectFirst {
            case l: org.apache.spark.sql.execution.LocalTableScanExec => l
          }.nonEmpty
          import s.implicits._
          q.collect().toSeq
            .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
              r.getLong(3), r.getLong(4), answered))
            .toDF("source", "n", "sum_chars", "mn_chars", "mx_chars",
              "metadata_answered")
            .orderBy(col("source"))
        }
      },
      Some("""SELECT source, count(*) AS n,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  min(n_chars) AS mn_chars, max(n_chars) AS mx_chars,
             |  TRUE AS metadata_answered
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // DISTINCT pushdown (round-17): SELECT DISTINCT k is the degenerate
    // grouped fold (a grouped plan with no aggregates) and global
    // COUNT(DISTINCT k) answers as the fold's exact cardinality —
    // metaGroupAgg merges proven single-group files with the grouped
    // boundary scan, so values co-occurring in a straddler never
    // double-count, and the NULL group is excluded per SQL semantics.
    // Composite keys fold too when every key column pins per file.
    "snap_distinct_pushdown" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapdistinct")
        val base = root + "/t"
        val docs = T(s, d, "documents").select(col("doc_id"), col("source"))
        Snapshots.write(docs.filter(col("doc_id") % 7 =!= 0)
            .repartition(24, col("source")), base,
          statsKey = Some("source"))
        Snapshots.append(docs.filter(col("doc_id") % 7 === 0).coalesce(1),
          base, statsKey = Some("source"))
        Snapshots.read(s, base).createOrReplaceTempView("snap_distinct_v")
        AggRule.withEnabled(s) {
          val dq = s.sql("SELECT DISTINCT source FROM snap_distinct_v")
          val cq = s.sql(
            "SELECT count(DISTINCT source) AS nd FROM snap_distinct_v")
          def answered(q: DataFrame) =
            q.queryExecution.executedPlan.collectFirst {
              case l: org.apache.spark.sql.execution.LocalTableScanExec => l
            }.nonEmpty
          val both = answered(dq) && answered(cq)
          val nd = cq.collect().head.getLong(0)
          import s.implicits._
          dq.collect().map(_.getString(0)).toSeq.sorted
            .map(src => (src, nd, both))
            .toDF("source", "n_distinct", "metadata_answered")
            .orderBy(col("source"))
        }
      },
      Some("""SELECT DISTINCT source,
             |  (SELECT count(DISTINCT source) FROM documents) AS n_distinct,
             |  TRUE AS metadata_answered
             |FROM documents ORDER BY source""".stripMargin)),

    // Filtered aggregate pushdown (round-17): MIN/MAX/SUM/AVG under a
    // WHERE via the Snapshots.metaBoundsWhere / metaSumWhere hybrids —
    // predicate-pruned files contribute nothing, files PROVEN fully
    // inside contribute their recorded bounds / sidecar sums unopened,
    // only boundary files scan with the residual. THE dashboard shapes
    // on a 100 TB events table: `SELECT max(ts), sum(amount) WHERE
    // date = yesterday`. The metadata_answered pin asserts the statement
    // planned as LocalTableScan; the only-boundary-files-open proof
    // lives in SnapshotAggRewriteSpec.
    "snap_minmax_where" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapminmaxw")
        val base = root + "/t"
        val docs = T(s, d, "documents").select(col("doc_id"), col("n_chars"))
        Snapshots.write(docs.repartitionByRange(8, col("doc_id")), base,
          statsKey = Some("doc_id"))
        Snapshots.writeStatsSidecars(s, base, Seq("n_chars"))
        Snapshots.writeSumSidecars(s, base, Seq("n_chars"))
        Snapshots.read(s, base).createOrReplaceTempView("snap_mmw_v")
        AggRule.withEnabled(s) {
          val q = s.sql(
            """SELECT min(doc_id) AS mn_id, max(doc_id) AS mx_id,
              |  min(n_chars) AS mn_chars, max(n_chars) AS mx_chars,
              |  sum(n_chars) AS sum_chars, avg(n_chars) AS avg_raw,
              |  count(*) AS n
              |FROM snap_mmw_v
              |WHERE doc_id >= 100 AND doc_id <= 5000""".stripMargin)
          val answered = q.queryExecution.executedPlan.collectFirst {
            case l: org.apache.spark.sql.execution.LocalTableScanExec => l
          }.nonEmpty
          val r = q.collect().head
          val avg6 = BigDecimal(r.getDouble(5))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          import s.implicits._
          Seq((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), avg6, r.getLong(6), answered))
            .toDF("mn_id", "mx_id", "mn_chars", "mx_chars", "sum_chars",
              "avg_chars", "n", "metadata_answered")
        }
      },
      Some("""SELECT min(doc_id) AS mn_id, max(doc_id) AS mx_id,
             |  min(n_chars) AS mn_chars, max(n_chars) AS mx_chars,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  round(avg(n_chars), 6) AS avg_chars, count(*) AS n,
             |  TRUE AS metadata_answered
             |FROM documents WHERE doc_id >= 100 AND doc_id <= 5000""".stripMargin)),

    // Change-data-feed from a BRANCH (round-17): option("branch") +
    // option("readChangeFeed") compose — the CDC feed walks the branch's
    // own commit chain (branch-aware Snapshots.changes), the WAP audit
    // subscriber's row-level view of staging. The fork snapshot arrives
    // as inserts stamped with the branch's first version, each branch
    // append as its own per-commit batch, and main's independent commit
    // never reaches the feed. Crash-replay pinned by the second drain
    // delivering nothing.
    "snap_stream_cdf_branch" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        import org.apache.spark.sql.streaming.Trigger
        val root = FixtureRoot.fresh("snapstreamcdfbr")
        val (base, sink) = (root + "/t", root + "/sink")
        val docs = T(s, d, "documents").select(col("doc_id"), col("n_chars"))
        Snapshots.write(docs.filter(col("doc_id") % 4 === 0), base)
        Snapshots.createBranch(s, base, "staging", 1L)
        Snapshots.appendBranch(docs.filter(col("doc_id") % 4 === 1),
          base, "staging")
        // main moves on independently — must NOT reach the branch feed
        Snapshots.append(docs.filter(col("doc_id") % 4 === 2), base)
        Snapshots.appendBranch(docs.filter(col("doc_id") % 4 === 3),
          base, "staging")
        def drain(): Long = {
          var batches = 0L
          val q = s.readStream.format("graft-snapshots")
            .option("branch", "staging")
            .option("readChangeFeed", "true")
            .option("changeKey", "doc_id")
            .option("maxVersionsPerTrigger", "1")
            .load(base)
            .writeStream
            .option("checkpointLocation", root + "/ckpt")
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, _: Long) =>
              batches += 1
              b.write.mode("append").parquet(sink)
              ()
            }
            .start()
          q.awaitTermination()
          batches
        }
        val nBatches = drain() // fork snapshot + 2 branch appends = 3 batches
        val replayNoop = drain() == 0L
        s.read.parquet(sink)
          .groupBy(col("_commit_version").as("commit_version"))
          .agg(count(lit(1)).as("n"), dsum(col("n_chars")).as("sum_chars"),
            min(col("_change_type")).as("change_type"))
          .withColumn("n_batches", lit(nBatches))
          .withColumn("replay_noop", lit(replayNoop))
          .orderBy(col("commit_version"))
      },
      Some("""WITH feed AS (
             |  SELECT 1 AS commit_version, n_chars FROM documents
             |  WHERE doc_id % 4 = 0
             |  UNION ALL
             |  SELECT 2, n_chars FROM documents WHERE doc_id % 4 = 1
             |  UNION ALL
             |  SELECT 3, n_chars FROM documents WHERE doc_id % 4 = 3)
             |SELECT commit_version, count(*) AS n,
             |  CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS sum_chars,
             |  'insert' AS change_type, 3 AS n_batches, TRUE AS replay_noop
             |FROM feed GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Metadata-answered aggregates (round-16): the opt-in Catalyst rule
    // graft.plans.SnapshotAggRewrite — Iceberg aggregate-pushdown /
    // Delta OptimizeMetadataOnlyDeltaQuery twin — rewrites a global
    // COUNT/MIN/MAX over a recognized snapshot scan into the manifest
    // folds countWhere/metaCount/metaBoundsOf and substitutes a one-row
    // LocalRelation at plan time. Here through the SQL surface (temp
    // view + spark.sql), attached via experimental.extraOptimizations;
    // the metadata_answered pin asserts both statements actually planned
    // as LocalTableScan (zero-IO proof lives in SnapshotAggRewriteSpec).
    "snap_agg_pushdown" -> Q(
      (s, d) => {
        import graft.plans.SnapshotAggRewrite
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapaggpd")
        val base = root + "/t"
        val docs = T(s, d, "documents")
          .select(col("doc_id"), col("source"), col("n_chars"))
        Snapshots.write(docs.repartitionByRange(4, col("doc_id")), base,
          statsKey = Some("doc_id"))
        Snapshots.writeStatsSidecars(s, base, Seq("n_chars"))
        Snapshots.read(s, base).createOrReplaceTempView("snap_agg_pd_v")
        def metadataAnswered(q: DataFrame): Boolean =
          q.queryExecution.executedPlan.collectFirst {
            case l: org.apache.spark.sql.execution.LocalTableScanExec => l
          }.nonEmpty
        AggRule.withEnabled(s) {
          val q1 = s.sql(
            "SELECT count(*) AS n FROM snap_agg_pd_v WHERE doc_id < 300")
          val q2 = s.sql(
            """SELECT min(doc_id) AS mn, max(doc_id) AS mx,
              |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
              |  count(*) AS n_all FROM snap_agg_pd_v""".stripMargin)
          val answered = metadataAnswered(q1) && metadataAnswered(q2)
          val nLow = q1.collect().head.getLong(0)
          val r = q2.collect().head
          import s.implicits._
          Seq((nLow, r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), answered))
            .toDF("n_low", "mn", "mx", "min_chars", "max_chars", "n_all",
              "metadata_answered")
        }
      },
      Some("""SELECT
             |  (SELECT count(*) FROM documents WHERE doc_id < 300) AS n_low,
             |  min(doc_id) AS mn, max(doc_id) AS mx,
             |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
             |  count(*) AS n_all, TRUE AS metadata_answered
             |FROM documents""".stripMargin)),

    // CAPSTONE (round-18): the COMPOSED streaming-ingest loop the
    // individually-keyed pieces add up to — the 100 TB continuous-curation
    // path end to end, exactly-once:
    //
    //   V1 stream source, BYTE-PACED (one file per trigger — offsets land
    //   mid-commit as v#k) → quality gate (ta_quality_gate's composite)
    //   → exact-dedup admission (intra-batch min-id + bloom-vs-corpus
    //   probe, dd_incremental_exact_bloom's shape) → exactly-once
    //   appendStream into a curated snapshot table → incremental MatView
    //   refresh per batch (snap_mv_stream's anchor catch-up)
    //
    // run as Trigger.AvailableNow over 3 commits, then a replay drain
    // (exactly-once across restart: 0 batches), then a 4th commit landing
    // while the stream is down and an incremental drain that admits only
    // novel texts against the corpus built so far. The fixture UNIONS a
    // deterministic duplicate slice (doc_id+10000001 shifts pmod-4 so
    // copies land one COMMIT later than their originals) so cross-commit
    // admission provably drops rows at every SF. The corpus bloom is
    // MAINTAINED, not rebuilt: built once (and on restart — the
    // incremental drain exercises that path), then OR-merged with each
    // admitted batch's hashes driver-side — admission stays O(batch)
    // while the corpus grows, the property that makes the loop
    // corpus-flat at 100 TB. The result reads the MATERIALIZED VIEW (not
    // the corpus) — per-band doc counts and token sums — so oracle-green
    // proves gate ∘ dedup ∘ exactly-once-append ∘ MV-refresh composed
    // correctly; `mv_consistent` additionally pins view == direct
    // aggregation of the curated table. All aggregates are functions of
    // the TEXT (band = n_tokens/10), so the result is invariant to WHICH
    // duplicate copy survives arrival-order races — the property that
    // makes a deterministic oracle possible under byte pacing. Batch
    // counts pin the pacing itself: 2-file commits at one file per
    // trigger give exactly 6 + 2 batches.
    "pipeline_stream_curation" -> Q(
      (s, d) => {
        import graft.store.{MatView, Snapshots}
        import graft.text.TextAnalysis
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.streaming.Trigger
        val root = FixtureRoot.fresh("streamcur")
        val (raw, corpus, mv) = (root + "/raw", root + "/corpus", root + "/mv")
        val appId = "pipeline_stream_curation"
        val docs = T(s, d, "documents").select(col("doc_id"), col("text"))
        val withDups = docs.unionByName(
          docs.filter(col("doc_id") % 7 === 3)
            .withColumn("doc_id", col("doc_id") + 10000001L))
        def slice(i: Int) =
          withDups.filter(pmod(col("doc_id"), lit(4)) === i).repartition(2)
        Snapshots.write(slice(0), raw)
        Snapshots.append(slice(1), raw)
        Snapshots.append(slice(2), raw)
        var corpusInit = false
        var mvInit = false
        var bloom: Option[org.apache.spark.util.sketch.BloomFilter] = None
        def ingest(batch: DataFrame, bid: Long): Unit = {
          val gated = TextAnalysis.qualityGate(batch, "text")
            .filter(col("keep"))
            .select(col("doc_id"), col("text"), col("n_tokens"))
          // intra-batch: keep the smallest id per text; cross-batch: the
          // MAINTAINED bloom (rebuilt from the corpus only on restart)
          // gates an exact confirm join — O(batch) per batch
          val intra = gated
            .withColumn("__rn", row_number().over(
              Window.partitionBy(col("text")).orderBy(col("doc_id"))))
            .filter(col("__rn") === 1).drop("__rn")
          if (bloom.isEmpty && corpusInit)
            bloom = Some(Dedup.contentBloom(
              Snapshots.read(s, corpus), "text", 1 << 12, 0.01))
          val admitted0 = bloom match {
            case Some(bf) => Dedup.bloomExactAdmissionWith(intra,
              Snapshots.read(s, corpus).select(col("text")), "text", bf)
            case None => intra // empty corpus: everything is novel
          }
          val admitted = admitted0
            .withColumn("band", floor(col("n_tokens") / lit(10)).cast("long"))
            .localCheckpoint() // one materialization: append + hash merge
          Snapshots.appendStream(admitted, corpus, appId, bid)
          corpusInit = true
          val bf = bloom.getOrElse(
            org.apache.spark.util.sketch.BloomFilter.create(1 << 12, 0.01))
          Dedup.mergeContentHashes(bf, admitted, "text")
          bloom = Some(bf)
          if (!mvInit) {
            MatView.create(s, corpus, mv, Seq("band"), "n_tokens"); mvInit = true
          } else MatView.refresh(s, corpus, mv, Seq("band"), "n_tokens")
          ()
        }
        def drain(): Long = {
          var batches = 0L
          val q = s.readStream.format("graft-snapshots")
            .option("maxBytesPerTrigger", "1") // one file per trigger
            .load(raw)
            .writeStream
            .option("checkpointLocation", root + "/ckpt")
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, bid: Long) =>
              ingest(b, bid)
              batches += 1
              ()
            }
            .start()
          q.awaitTermination()
          batches
        }
        val firstBatches = drain() // 3 commits × 2 files, one per trigger
        val replayNoop = drain() == 0L // caught-up restart: exactly-once
        Snapshots.append(slice(3), raw) // lands while the stream is down
        val incrBatches = drain() // only novel texts admitted vs the corpus
        val view = MatView.read(s, mv)
        val direct = Snapshots.read(s, corpus).groupBy(col("band"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_tokens").cast("decimal(18,2)"))
              .cast("decimal(28,2)").as("total"))
        val consistent =
          view.select(col("band"), col("n"), col("total")).except(direct).isEmpty &&
            direct.except(view.select(col("band"), col("n"), col("total"))).isEmpty
        view
          .select(col("band"), col("n"), col("total").cast("double").as("total"))
          .withColumn("first_batches", lit(firstBatches))
          .withColumn("replay_noop", lit(replayNoop))
          .withColumn("incr_batches", lit(incrBatches))
          .withColumn("mv_consistent", lit(consistent))
          .orderBy(col("band"))
      },
      Some("""WITH raw AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 10000001, text FROM documents WHERE doc_id % 7 = 3),
             |t AS (SELECT doc_id, text,
             |    list_filter(regexp_split_to_array(text, '\s+'),
             |                x -> length(x) > 0) AS toks,
             |    list_filter(regexp_split_to_array(lower(text), '\s+'),
             |                x -> length(x) > 0) AS ltoks
             |  FROM raw),
             |m AS (SELECT doc_id, text, len(toks) AS n,
             |    CASE WHEN len(toks) > 0
             |         THEN len(list_distinct(toks)) * 1.0 / len(toks) END AS ttr,
             |    CASE WHEN len(toks) > 0
             |         THEN list_sum(list_transform(toks, x -> length(x))) * 1.0
             |              / len(toks) END AS awl,
             |    CASE WHEN len(ltoks) > 0
             |         THEN len(list_filter(ltoks,
             |                x -> x IN ('the', 'a', 'of', 'and'))) * 1.0
             |              / len(ltoks) END AS sw
             |  FROM t),
             |g AS (SELECT text, CAST(n AS BIGINT) AS n FROM m
             |      WHERE (n BETWEEN 20 AND 90) AND (awl BETWEEN 3.8 AND 5.2)
             |        AND ttr >= 0.45 AND sw >= 0.02),
             |surv AS (SELECT text, min(n) AS n_tokens FROM g GROUP BY text)
             |SELECT CAST(floor(n_tokens / 10) AS BIGINT) AS band,
             |  count(*) AS n,
             |  CAST(sum(CAST(n_tokens AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  6 AS first_batches, TRUE AS replay_noop, 2 AS incr_batches,
             |  TRUE AS mv_consistent
             |FROM surv GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Byte-paced CHANGE FEED (round-18): the pure-append decomposition
    // lets maxBytesPerTrigger cut a CDF stream INSIDE append commits
    // (v#k offsets over the added-file list, per-commit _commit_version
    // stamps intact) while a rewriting commit admits atomically as one
    // trigger's unit. Lifecycle: two 2-file append commits pace as four
    // single-file insert batches (the initial snapshot itself paces);
    // after a restart a CoW delete arrives alone as one whole-version
    // batch of deletes and a final 2-file append paces again (3 more) —
    // 4 + 3 batches exactly, pinned, with the replay drain a no-op.
    // Oracle replays the feed
    // relationally; per-commit stamps surviving the mid-commit cuts are
    // what the hash proves.
    "snap_stream_cdf_paced" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        import org.apache.spark.sql.streaming.Trigger
        val root = FixtureRoot.fresh("snapcdfpaced")
        val (base, sink) = (root + "/t", root + "/sink")
        val docs = T(s, d, "documents").select(col("doc_id"), col("n_chars"))
        Snapshots.write(
          docs.filter(col("doc_id") % 4 === 0).repartition(2), base)
        Snapshots.append(
          docs.filter(col("doc_id") % 4 === 1).repartition(2), base)
        def drain(): Long = {
          var batches = 0L
          val q = s.readStream.format("graft-snapshots")
            .option("readChangeFeed", "true")
            .option("changeKey", "doc_id")
            .option("maxBytesPerTrigger", "1") // one file per trigger
            .load(base)
            .writeStream
            .option("checkpointLocation", root + "/ckpt")
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (b: DataFrame, _: Long) =>
              batches += 1
              b.write.mode("append").parquet(sink)
              ()
            }
            .start()
          q.awaitTermination()
          batches
        }
        val pacedBatches = drain() // 2+2 files, one per trigger
        // a CoW rewrite and a fresh append land while the stream is down
        Snapshots.deleteWhere(s, base, col("doc_id") % 8 === 1)
        Snapshots.append(
          docs.filter(col("doc_id") % 4 === 2).repartition(2), base)
        val mixedBatches = drain() // rewrite alone + 2 paced files
        val replayNoop = drain() == 0L
        s.read.parquet(sink)
          .groupBy(col("_commit_version").as("commit_version"),
            col("_change_type").as("change_type"))
          .agg(count(lit(1)).as("n"), dsum(col("n_chars")).as("sum_chars"))
          .withColumn("paced_batches", lit(pacedBatches))
          .withColumn("mixed_batches", lit(mixedBatches))
          .withColumn("replay_noop", lit(replayNoop))
          .orderBy(col("commit_version"), col("change_type"))
      },
      Some("""WITH feed AS (
             |  SELECT 1 AS cv, 'insert' AS ct, n_chars FROM documents
             |  WHERE doc_id % 4 = 0
             |  UNION ALL
             |  SELECT 2, 'insert', n_chars FROM documents WHERE doc_id % 4 = 1
             |  UNION ALL
             |  SELECT 3, 'delete', n_chars FROM documents WHERE doc_id % 8 = 1
             |  UNION ALL
             |  SELECT 4, 'insert', n_chars FROM documents WHERE doc_id % 4 = 2)
             |SELECT cv AS commit_version, ct AS change_type, count(*) AS n,
             |  CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS sum_chars,
             |  4 AS paced_batches, 3 AS mixed_batches, TRUE AS replay_noop
             |FROM feed GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Shallow CLONE lifecycle (round-18): Delta's `CREATE TABLE dst
    // SHALLOW CLONE src` — a zero-copy cross-table fork whose v1
    // references the source's files by absolute path — followed by the
    // full divergence-and-release arc: the source full-replaces and
    // EXPIRES the cloned snapshot (the `_clones/` registry protects the
    // referenced files from its vacuum — the hazard Delta documents as
    // "vacuum may break shallow clones" is a hard guarantee here); the
    // clone MoR-deletes rows living in source-owned files, appends its
    // own, folds the deletes, deepenClone localizes the remaining refs
    // byte-exactly, and detachClone lifts the protection — after which
    // the source's vacuum reclaims the debris. Booleans pin each phase:
    // zero_copy (pre-divergence clone dir holds only its manifest),
    // gc_protected (source v1 data survives expire+vacuum while
    // referenced), detached, collected (same files reclaimed after).
    // The oracle recomputes the clone's final content relationally —
    // fork image minus the MoR delete plus the clone-only rows.
    "snap_shallow_clone" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapclone")
        val (src, dst) = (root + "/src", root + "/dst")
        val docs = T(s, d, "documents").select(col("doc_id"), col("n_chars"))
        Snapshots.write(docs.filter(col("doc_id") % 3 =!= 0).repartition(8),
          src, statsKey = Some("doc_id"))
        Snapshots.shallowClone(s, src, dst)
        def hasV1Parts: Boolean = {
          val v1 = new java.io.File(src, "v=1")
          v1.isDirectory &&
            v1.listFiles().exists(_.getName.startsWith("part-"))
        }
        val zeroCopy = {
          val names = scala.collection.mutable.Buffer.empty[String]
          java.nio.file.Files.walk(java.nio.file.Paths.get(dst)).forEach(p =>
            if (java.nio.file.Files.isRegularFile(p))
              names += p.getFileName.toString)
          names.nonEmpty && names.forall(_.contains("_manifest"))
        }
        // source diverges: full replace, then expire + vacuum the cloned
        // snapshot — its files must survive on the registry's protection
        Snapshots.write(docs.filter(col("doc_id") % 3 === 0), src)
        Snapshots.expire(s, src, keep = 1)
        Snapshots.vacuum(s, src, txnTtlMs = 0L)
        val gcProtected = hasV1Parts
        // clone diverges: positional deletes over source-owned files,
        // then clone-only rows (negated n_chars marks provenance)
        Snapshots.deleteWhereMoR(s, dst, col("doc_id") % 7 === 2)
        Snapshots.append(docs.filter(col("doc_id") % 3 === 0)
          .withColumn("n_chars", -col("n_chars")), dst)
        // release: fold deletes, localize, retire ref-holders, detach
        Snapshots.materializeDeletes(s, dst)
        Snapshots.deepenClone(s, dst)
        Snapshots.expire(s, dst, keep = 1)
        val detached = Snapshots.detachClone(s, src, dst)
        Snapshots.vacuum(s, src, txnTtlMs = 0L)
        val collected = !hasV1Parts
        Snapshots.read(s, dst)
          .groupBy((col("doc_id") % 10).as("bucket"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
          .withColumn("zero_copy", lit(zeroCopy))
          .withColumn("gc_protected", lit(gcProtected))
          .withColumn("detached", lit(detached))
          .withColumn("collected", lit(collected))
          .orderBy(col("bucket"))
      },
      Some("""WITH cl AS (
             |  SELECT doc_id, n_chars FROM documents
             |  WHERE doc_id % 3 <> 0 AND doc_id % 7 <> 2
             |  UNION ALL
             |  SELECT doc_id, -n_chars FROM documents WHERE doc_id % 3 = 0)
             |SELECT doc_id % 10 AS bucket, count(*) AS n,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  TRUE AS zero_copy, TRUE AS gc_protected, TRUE AS detached,
             |  TRUE AS collected
             |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Clone refresh (round-18): the in-place twin of Delta's `CREATE OR
    // REPLACE … SHALLOW CLONE` — re-sync an undiverged dev mirror to the
    // source's current head as one zero-copy metadata commit, clone
    // history preserved. The mirror is a snapshot, not a live view:
    // later source commits stay invisible until the next refresh, a
    // caught-up refresh no-ops, and the source expiring+vacuuming every
    // mirrored vintage leaves the mirror (and its time-travelable fork
    // image) whole — the `_clones/` registry protects every referenced
    // vintage, not just the newest. Oracle: after the refresh the mirror
    // is exactly the full documents table.
    "snap_clone_refresh" -> Q(
      (s, d) => {
        import graft.store.Snapshots
        val root = FixtureRoot.fresh("snapclonerefresh")
        val (src, dst) = (root + "/src", root + "/dst")
        val docs = T(s, d, "documents").select(col("doc_id"), col("n_chars"))
        Snapshots.write(docs.filter(col("doc_id") % 2 === 0).repartition(4),
          src, statsKey = Some("doc_id"))
        Snapshots.shallowClone(s, src, dst)
        Snapshots.append(docs.filter(col("doc_id") % 2 === 1), src,
          statsKey = Some("doc_id"))
        val v2 = Snapshots.refreshClone(s, src, dst)
        val refreshedNoop = Snapshots.refreshClone(s, src, dst) == v2
        Snapshots.write(docs.limit(1), src) // post-refresh source commit
        Snapshots.expire(s, src, keep = 1)
        Snapshots.vacuum(s, src, txnTtlMs = 0L)
        val forkPreserved =
          Snapshots.read(s, dst, Some(1L)).count() ==
            docs.filter(col("doc_id") % 2 === 0).count()
        Snapshots.read(s, dst)
          .groupBy((col("doc_id") % 10).as("bucket"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
          .withColumn("refreshed_noop", lit(refreshedNoop))
          .withColumn("fork_preserved", lit(forkPreserved))
          .orderBy(col("bucket"))
      },
      Some("""SELECT doc_id % 10 AS bucket, count(*) AS n,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  TRUE AS refreshed_noop, TRUE AS fork_preserved
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
