package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/**
 * Plan-regression pins for the 100 TB checklist: pushdown reaches the scan,
 * small sides broadcast, top-k physicalizes as TakeOrderedAndProject, top-1
 * per group gets WindowGroupLimit. If an edit silently trades one of these
 * away, this spec fails before the bench does.
 */
class PlanAuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("p1_key_filter: predicate is pushed to the parquet scan") {
    val p = planOf("p1_key_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), LessThanOrEqual(l_orderkey,10)]"), p)
  }

  test("tpch_q6_forecast: every predicate reaches the scan, agg is partial+final") {
    val p = planOf("tpch_q6_forecast")
    // PushedFilters renders truncated in toString — assert via the Filter node
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(p.contains("< 24.0"), p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("tpch_q5_region_revenue: dimension joins broadcast (no SMJ at dim size)") {
    val p = planOf("tpch_q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("tpch_q18_large_orders: the filtered aggregate side is the build side") {
    val p = planOf("tpch_q18_large_orders")
    assert(p.contains("BroadcastHashJoin"), p)
    // broadcast exchange must sit above the HAVING aggregate, not the orders scan
    val bIdx = p.indexOf("BroadcastExchange")
    assert(bIdx >= 0 && p.indexOf("HashAggregate", bIdx) >= 0, p)
  }

  test("cu_corpus_shuffle: head selection is TakeOrderedAndProject, numbering is windowless") {
    val p = planOf("cu_corpus_shuffle")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p) // self-join numbering — no WindowExec at all
  }

  test("cu_quality_bins: the benched plan is the cutpoints path — no window, no ntile") {
    val p = planOf("cu_quality_bins")
    assert(!p.contains("Window"), p)
    assert(!p.contains("ntile"), p)
  }

  test("w5_topk_score: top-k is TakeOrderedAndProject, never a global sort") {
    val p = planOf("w5_topk_score")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("w2_top1_per_group: Spark 4 WindowGroupLimit kicks in (partial+final)") {
    val p = planOf("w2_top1_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("w7_topk_per_group: k>1 still plans partial+final WindowGroupLimit") {
    val p = planOf("w7_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("Partial"), p)
  }

  test("mm_crossmodal_knn: media side broadcasts, corpus streams, top-k pre-pruned") {
    val p = planOf("mm_crossmodal_knn")
    // the tiny pooled-media relation must be the BROADCAST side of the
    // deliberate bounded cross — a corpus-side broadcast would ship the
    // whole embedding table per executor at scale
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastExchange"), p)
    // rank<=3 per media physicalizes as WindowGroupLimit before the window
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("tpch_q4: correlated EXISTS plans as a semi join, never a per-row subquery") {
    val p = planOf("tpch_q4_priority_check")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch_q10: dimension sides broadcast, fact shuffles once for the agg") {
    val p = planOf("tpch_q10_returned")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("banded LSH candidate pairs: equi-join on (band, bucket), never a cartesian") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.TestData.documents(spark, sf).filter(col("doc_id") < 50)
    val sig = graft.dedup.Dedup.simhashSignatures(docs, "doc_id", "text")
    val p = graft.dedup.Dedup.bandedSigPairs(sig, "doc_id", sigBits = 64, bands = 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banded blocking must stay an equi-join:\n${p.take(2000)}")
  }

  test("runtime bloom filter prunes the big side of a selective fact join") {
    // Spark's runtime row-level filtering: a selective dimension side should
    // inject a bloom filter into the lineitem scan — the 100 TB join-pruning
    // story. Thresholds lowered so the sf0.001 fixture triggers the rewrite.
    val s = spark
    import org.apache.spark.sql.functions.col
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        s.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        s.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        s.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        s.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      val lineitem = graft.sources.TestData.table(s, sf, "lineitem")
      val orders = graft.sources.TestData.table(s, sf, "orders")
        .filter(col("o_totalprice") > 500000.0) // selective build side
      val j = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"),
        s"expected a runtime bloom filter on the fact scan:\n${p.take(3000)}")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("tpch_q2: agg and window share ONE fact shuffle (prefix-key repartition)") {
    val p = planOf("tpch_q2_min_cost_supp")
    // exactly one non-broadcast Exchange below the window: the explicit
    // repartition on p_partkey serves both the (part,name,supp) agg and the
    // per-part window min — a second exchange means the sharing regressed
    val shuffles = "(?<!Broadcast)Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"expected 1 shared fact shuffle, got $shuffles\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("tpch_q21: window-count reformulation keeps two shuffles, no self-join") {
    val p = planOf("tpch_q21_sole_late_supp")
    val shuffles = "(?<!Broadcast)Exchange hashpartitioning".r.findAllIn(p).size
    // one shared (agg+window on o_orderkey) + one for the final per-supplier count
    assert(shuffles == 2, s"expected 2 shuffles, got $shuffles\n$p")
    assert(!p.contains("SortMergeJoin"), p) // the exists/not-exists pair never self-joins
  }

  test("tpch_q20: dominant-supplier set broadcasts into the semi join") {
    val p = planOf("tpch_q20_dominant_supp")
    assert("BroadcastHashJoin \\[[^\\]]*\\], \\[[^\\]]*\\], LeftSemi".r
      .findFirstIn(p).isDefined, p)
  }

  test("g1_khop: each BFS round is hash joins, never a nested-loop product") {
    val p = planOf("g1_khop_reachability")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("gov_pseudonymize: the dimension side broadcasts into the fact scan") {
    val p = planOf("gov_pseudonymize")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p) // top-20 never global-sorts
  }

  test("cu_cm_topk: bounded sides broadcast — the corpus never builds a hash table") {
    val p = planOf("cu_cm_topk")
    // sketch (O(depth*width)) joins candidates via broadcast, and the
    // selected top-k broadcasts into the exact-count semi join
    assert("BroadcastHashJoin \\[[^\\]]*\\], \\[[^\\]]*\\], LeftSemi".r
      .findFirstIn(p).isDefined, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("cu_cutpoint_bins: binning fuses into the scan stage (single exchange for the rollup)") {
    val p = planOf("cu_cutpoint_bins")
    // one exchange for the bin rollup; the bin expression itself adds none
    assert(p.linesIterator.count(_.trim.startsWith("Exchange")) <= 2, p)
    assert(!p.contains("Window"), p) // no ntile global sort on the scale path
  }

  test("ta_bm25_search: postings pruned pre-explode, no corpus-wide token shuffle") {
    val p = planOf("ta_bm25_search")
    // the single Generate must explode the query-filtered `hits` array —
    // never the full token array
    val gen = p.linesIterator.filter(_.contains("Generate explode")).toSeq
    assert(gen.size == 1 && gen.head.contains("hits"), p)
    // doc length is size(tokens) in the scan projection and df rides in the
    // one-row corpus aggregate, so the only exchanges are the (doc, term)
    // postings agg, the final per-doc agg, and the stats SinglePartition
    assert(p.linesIterator.count(_.trim.startsWith("Exchange")) <= 3, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p) // corpus stats row broadcasts
  }

  test("pipeline_pretraining: ONE tokenize explode feeds entropy + LM + token counts") {
    // the round-11 fusion's contract: the capstone must never regrow the
    // triple-explode plan (its pre-fusion shape — 3 full explode+shuffle
    // passes and the battery's worst scale slope). tokenStats' single
    // Generate is the only explode in the whole pipeline; the corpus-total
    // scalar is size() arithmetic on a scan, not an explode.
    // the persisted fan-out boundary prints its ONE cached plan at every
    // InMemoryTableScan reference site, so raw line counts over-count;
    // distinct normalized nodes (tree-art stripped) is the real node set —
    // pre-fusion the four explodes carried four DIFFERENT expression ids
    // and this assertion fails exactly as intended
    val p = planOf("pipeline_pretraining")
    val gens = p.linesIterator.filter(_.contains("Generate explode"))
      .map(l => l.substring(l.indexOf("+- Generate"))).toSet
    assert(gens.size == 1, s"expected exactly 1 distinct explode, got ${gens.size}:\n$p")
  }

  test("ta_token_stats: fused stats derive from a single explode + two shuffles of (doc,tok)") {
    val p = planOf("ta_token_stats")
    assert(p.linesIterator.count(_.contains("Generate explode")) == 1, p)
    // corpus frequencies are a window on the count frame, not a vocab join
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("cu_interleave: one per-source window; global numbering is a bounded broadcast join, not a window") {
    val p = planOf("cu_interleave")
    // the count frame broadcasts into the non-equi join (20 rows, bounded)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // exactly ONE Window operator (the per-source epoch number) — a global
    // row_number would appear as a second, single-partition window.
    // "Window [" matches the operator, never WindowGroupLimit
    assert(p.linesIterator.count(_.contains("Window [")) == 1, p)
  }

  test("w4b_keyset_page: seek predicate reaches the scan, page is TakeOrderedAndProject") {
    val p = planOf("w4b_keyset_page")
    // the whole null-safe seek — (date < c OR date IS NULL) OR
    // (date <=> c AND (key < k OR key IS NULL)) — is a pushable source
    // filter: row groups beyond the cursor prune on stats, and the NULLS
    // LAST block stays reachable (round-12 advisor item)
    assert(p.contains("PushedFilters: [Or(Or(LessThan(o_orderdate,"), p)
    assert(p.contains("IsNull(o_orderdate)"), p)
    // and the page itself is a top-k, never sort-then-offset
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("GlobalLimit"), p)
  }

  test("cu_target_mix: rates ride a broadcast, replication is one explode, corpus never SMJs") {
    val p = planOf("cu_target_mix")
    assert(p.contains("BroadcastHashJoin"), p)  // source-dimension rates
    assert(p.contains("Generate explode"), p)   // the only replication pass
    assert(!p.contains("SortMergeJoin"), p)     // corpus is never shuffled for a join
  }

  test("dd_incremental_exact_bloom: bloom prefilter sits on the scan before any join") {
    val p = planOf("dd_incremental_exact_bloom")
    assert(p.contains("bloom_might_contain"), p)
    // the confirm path is an anti join on the candidates, never a full
    // batch x corpus comparison
    assert(p.contains("LeftAnti"), p)
  }

  test("ta_keywords: per-doc top-k is a WindowGroupLimit, df join never SMJs") {
    val p = planOf("ta_keywords")
    assert(p.contains("WindowGroupLimit"), p) // rank<=k prunes map-side
    assert(!p.contains("SortMergeJoin"), p)   // N broadcasts; df is a window
  }

  test("cu_temperature_mix: keep decision is a scalar — corpus joins only the broadcast rates") {
    val p = planOf("cu_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dq_outliers: both stats joins broadcast, corpus never shuffles for the join") {
    val p = planOf("dq_outliers")
    val broadcasts = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 2, p) // median + MAD stats both broadcast
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("v3_knn_cosine: scan → cosine → TakeOrderedAndProject, codegen'd hot loop") {
    val df = SparkEntry.queries("v3_knn_cosine")(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    // the cosine expression must participate in whole-stage codegen
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) { df.explain("codegen") }
    val cg = buf.toString("UTF-8")
    assert(cg.contains("WholeStageCodegen"), cg.take(2000))
  }

  test("v8_filtered_knn: metadata semi-join prunes BEFORE the cosine top-k") {
    val p = planOf("v8_filtered_knn")
    // the lang predicate must reach the documents scan…
    assert(p.contains("EqualTo(lang,en)"), p)
    // …the candidate prune is a broadcast semi-join, not a shuffle…
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    // …and the top-k stays a TakeOrderedAndProject ABOVE the join (the
    // cosine is evaluated only on the filtered survivors)
    val topKIdx = p.indexOf("TakeOrderedAndProject")
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(topKIdx >= 0 && joinIdx > topKIdx,
      s"top-k must sit above the semi-join (cosine after pruning):\n$p")
  }

  test("x12_scd2 / x13_interval_merge: window chains keep to one key exchange") {
    for (q <- Seq("x12_scd2", "x13_interval_merge")) {
      val p = planOf(q)
      val n = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).size
      assert(n == 1, s"$q: expected 1 user_id exchange, got $n:\n$p")
    }
  }

  test("dd_span_removal: no pair join anywhere — dup set and coverage broadcast back") {
    val p = planOf("dd_span_removal")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)          // every join-back is broadcast-able
    assert(p.contains("LeftAnti"), p)                // coverage is subtracted, not re-joined
    assert(!p.toLowerCase.contains("no partition defined"), p) // no global window
  }

  test("dd_winnow: fingerprint selection is row-local — no join, no window, " +
       "one exchange (the final distinct)") {
    val p = planOf("dd_winnow")
    assert(!p.contains("Join"), p)     // selection never pairs documents
    assert(!p.contains("WindowExec"), p)
    // only the distinct (and the orderBy range exchange above it) shuffle;
    // the md5/array pipeline itself must stay inside projections
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
  }

  test("dd_semdedup: the only nested-loop is the K-centroid broadcast cross; " +
       "the pairwise stage stays an equi-join keyed on cluster") {
    val p = planOf("dd_semdedup")
    assert(!p.contains("CartesianProduct"), p)
    // every nested-loop occurrence must be the deliberate broadcast cross
    // against the tiny centroid table (the cached assignment subtree prints
    // once per consumer, so count lines, check their shape)
    val bnlj = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.nonEmpty && bnlj.forall(_.contains("BuildRight, Cross")), p)
    // the quadratic candidate stage must be KEYED on cluster (equi-join with
    // the id inequality as residual), never an unkeyed product
    assert("""Join \[cluster#\d+\], \[cluster#\d+\], Inner""".r
      .findFirstIn(p).isDefined, p)
  }

  test("cu_dsir_weights: gram aggregates are materialized once — fan-out reads the checkpoint") {
    // three consumers with different grouping keys hang off the raw
    // (doc,bucket) aggregate and two off the target marginal; without the
    // materialization the corpus tokenizes 3×/2× (measured 5.95 s vs
    // 2.70 s isolated at sf0.1 — BASELINE.md round-13 notes). Round 14
    // switched the .persist() to an eager localCheckpoint (same
    // MEMORY_AND_DISK blocks, but ContextCleaner-released instead of a
    // CacheManager entry that outlives the call — advisor item), so the
    // pin is now: every corpus access is a checkpoint-RDD scan, and the
    // raw TOKENIZE pipeline (the explode) appears nowhere in the plan.
    val p = planOf("cu_dsir_weights")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Generate explode"), p)
    // and the log-ratio table still BROADCASTS to the per-doc join (the
    // ≤buckets-row side must never shuffle the corpus)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("pipeline_neardup_pretraining: operator census is pinned (round-15 variance watch)") {
    // The capstone's battery time has spread 8.8-27.3 s across sessions
    // with a claim of "plan unchanged" — this makes that claim mechanical:
    // any drift in shuffle/join/explode/window-limit structure fails HERE
    // before the bench moves, so a future high reading is attributable to
    // the host or a phase (Bench's neardup_phases timers), never to a
    // silently different plan. Note: constructing the query RUNS the CC
    // loop's checkpointed rounds at sf0.001; the census covers the fused
    // tokenize-gate head and the post-CC survivor/mix/split tail around
    // the checkpoint scans.
    val p = planOf("pipeline_neardup_pretraining")
    assert(!p.contains("CartesianProduct"), "no all-pairs, ever")
    val shuffles = "(?<!Broadcast)Exchange hashpartitioning".r.findAllIn(p).size
    val explodes = p.linesIterator.count(_.contains("Generate explode"))
    val smj = "SortMergeJoin".r.findAllIn(p).size
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    val winlim = "WindowGroupLimit".r.findAllIn(p).size
    val census = (shuffles, explodes, smj, bhj, winlim)
    assert(census == ((30, 8, 2, 11, 4)),
      s"capstone plan census drifted (shuffles, explodes, SMJ, BHJ, " +
        s"WindowGroupLimit): $census - if the change is intentional, " +
        "re-pin alongside a bench A/B")
  }
}
