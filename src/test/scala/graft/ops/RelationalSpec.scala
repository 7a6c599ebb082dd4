package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** P/J/A/W operator invariants. */
class RelationalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val items = Seq(
    ("wf1", "m1", 10L), ("wf1", "m2", 20L), ("wf1", "m3", 30L),
    ("wf2", "x1", 5L)
  ).toDF("workflow_id", "id", "ts")

  test("W1: sequence is dense 0..n-1 per group; next_id chains; last is null") {
    val r = Relational.sequenceAndNext(items, "workflow_id", "id", Seq(col("ts")))
      .orderBy("workflow_id", "sequence")
      .select("workflow_id", "id", "sequence", "next_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), Option(r.getString(3))))
    assert(r.toSeq == Seq(
      ("wf1", "m1", 0, Some("m2")),
      ("wf1", "m2", 1, Some("m3")),
      ("wf1", "m3", 2, None),
      ("wf2", "x1", 0, None)))
  }

  test("A1: nextSequence is max+1, empty group handled by coalesce-to-0 semantics") {
    val withSeq = items.withColumn("sequence", (col("ts") / 10).cast("int"))
    val r = Relational.nextSequence(withSeq, "workflow_id")
      .as[(String, Int)].collect().toMap
    assert(r("wf1") == 4) // max seq 3 → next 4
  }

  test("W2: top-1 per group by ord") {
    val r = Relational.top1PerGroup(items, "workflow_id", Seq(col("ts").desc))
      .select("workflow_id", "id").as[(String, String)].collect().toMap
    assert(r == Map("wf1" -> "m3", "wf2" -> "x1"))
  }

  test("J3: notExisting keeps only unseen keys; existing keeps only seen") {
    val incoming = Seq(("wf1", "m2"), ("wf1", "new")).toDF("workflow_id", "id")
    val anti = Relational.notExisting(incoming, items, Seq("workflow_id", "id"))
      .select("id").as[String].collect().toSeq
    assert(anti == Seq("new"))
    val semi = Relational.existing(incoming, items, Seq("workflow_id", "id"))
      .select("id").as[String].collect().toSeq
    assert(semi == Seq("m2"))
  }

  test("J2/U1: unionKind tags provenance and aligns by name") {
    val a = Seq(("x", 1)).toDF("name", "v")
    val b = Seq(("y", 2)).toDF("name", "v")
    val r = Relational.unionKind(a, "alpha", b, "beta")
      .select("kind", "name").as[(String, String)].collect().toSet
    assert(r == Set(("alpha", "x"), ("beta", "y")))
  }

  test("W4: paginate = orderBy + offset + limit") {
    val df = (1 to 10).toDF("n")
    val r = Relational.paginate(df, Seq(col("n").desc), offsetN = 2, limitN = 3)
      .as[Int].collect().toSeq
    assert(r == Seq(8, 7, 6))
  }

  test("W5: topK returns exactly k ordered rows") {
    val df = (1 to 100).toDF("n")
    val r = Relational.topK(df, Seq(col("n").desc), 5).as[Int].collect().toSeq
    assert(r == Seq(100, 99, 98, 97, 96))
  }

  test("saltedSum: two-phase aggregation matches the direct groupBy") {
    // hot key: 900 of 1000 rows share key "hot"
    val df = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i.toLong))
      .toDF("key", "v")
    val salted = Relational.saltedSum(df, "key", salts = 8, sumCols = Seq("v"))
      .select("key", "n_rows", "sum_v")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val direct = df.groupBy("key").agg(count(lit(1)), sum("v"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(salted == direct)
  }

  test("saltedJoin: replicated-right join matches the plain join") {
    val left = Seq.fill(500)("hot").zipWithIndex.map { case (k, i) => (k, i) }
      .toDF("lk", "lv")
    val right = Seq(("hot", "H"), ("cold", "C")).toDF("rk", "rv")
    val salted = Relational.saltedJoin(left, right, "lk", "rk", salts = 4)
      .select("lv", "rv").as[(Int, String)].collect().sorted.toSeq
    val plain = left.join(right, col("lk") === col("rk"))
      .select("lv", "rv").as[(Int, String)].collect().sorted.toSeq
    assert(salted == plain && salted.size == 500)
  }

  test("asofJoin: latest prior right payload, inclusive ties, null before first state") {
    val probes = Seq(
      ("u1", 5L, "p@5"), ("u1", 10L, "p@10"), ("u1", 20L, "p@20"),
      ("u2", 7L, "p@7")
    ).toDF("key", "t", "tag")
    val state = Seq(
      ("u1", 10L, 1.0), ("u1", 15L, 2.0), // state at 10 (tie with probe@10) and 15
      ("u3", 1L, 9.9)                      // unrelated key
    ).toDF("key", "st", "price")
    val r = Relational.asofJoin(probes, state, "key", "t", "st", Seq("price"))
      .select("key", "t", "price").as[(String, Long, Option[Double])]
      .collect().sortBy(x => (x._1, x._2)).toSeq
    assert(r == Seq(
      ("u1", 5L, None),        // before any state
      ("u1", 10L, Some(1.0)),  // inclusive: state@10 visible to probe@10
      ("u1", 20L, Some(2.0)),  // latest prior (15), not first
      ("u2", 7L, None)))       // key with no state at all
  }

  test("asofJoinForward: nearest future payload, inclusive ties, null after last state") {
    val probes = Seq(
      ("u1", 5L, "p@5"), ("u1", 10L, "p@10"), ("u1", 20L, "p@20"),
      ("u2", 7L, "p@7")
    ).toDF("key", "t", "tag")
    val state = Seq(
      ("u1", 10L, 1.0), ("u1", 15L, 2.0),
      ("u3", 1L, 9.9)
    ).toDF("key", "st", "price")
    val r = Relational.asofJoinForward(probes, state, "key", "t", "st", Seq("price"))
      .select("key", "t", "price").as[(String, Long, Option[Double])]
      .collect().sortBy(x => (x._1, x._2)).toSeq
    assert(r == Seq(
      ("u1", 5L, Some(1.0)),   // nearest future (10), not furthest (15)
      ("u1", 10L, Some(1.0)),  // inclusive: state@10 visible to probe@10
      ("u1", 20L, None),       // after every state
      ("u2", 7L, None)))       // key with no state at all
  }

  test("asofJoinNearest: closest state either direction, exact-tie to the past, null only when keyless") {
    val probes = Seq(
      ("u1", 5L, "p@5"),   // nearest is 10 (forward; no past state)
      ("u1", 12L, "p@12"), // past 10 (d=2) beats future 15 (d=3)
      ("u1", 14L, "p@14"), // future 15 (d=1) beats past 10 (d=4)
      ("u1", 20L, "p@20"), // equidistant NOT possible here; past 15 (d=5)... vs nothing after → 15
      ("u1", 25L, "p@25"), // tie: past 15 is d=10, future none → 15
      ("u2", 7L, "p@7")
    ).toDF("key", "t", "tag")
    val state = Seq(
      ("u1", 10L, 1.0), ("u1", 15L, 2.0),
      ("u3", 1L, 9.9)
    ).toDF("key", "st", "price")
    val r = Relational.asofJoinNearest(probes, state, "key", "t", "st", Seq("price"))
      .select("key", "t", "price").as[(String, Long, Option[Double])]
      .collect().sortBy(x => (x._1, x._2)).toSeq
    assert(r == Seq(
      ("u1", 5L, Some(1.0)),
      ("u1", 12L, Some(1.0)),
      ("u1", 14L, Some(2.0)),
      ("u1", 20L, Some(2.0)),
      ("u1", 25L, Some(2.0)),
      ("u2", 7L, None)))
    // exact equidistance breaks to the PAST: probe at 12.5 between 10/15 —
    // use integer midpoint with symmetric states
    val p2 = Seq(("u1", 20L, "x")).toDF("key", "t", "tag")
    val s2 = Seq(("u1", 15L, 1.0), ("u1", 25L, 2.0)).toDF("key", "st", "price")
    val mid = Relational.asofJoinNearest(p2, s2, "key", "t", "st", Seq("price"))
      .select("price").as[Double].head()
    assert(mid == 1.0, "equidistant match must take the past state")
    // and an exact-time match wins outright (delta 0, backward-inclusive)
    val p3 = Seq(("u1", 15L, "x")).toDF("key", "t", "tag")
    val ex = Relational.asofJoinNearest(p3, s2, "key", "t", "st", Seq("price"))
      .select("price").as[Double].head()
    assert(ex == 1.0)
  }

  test("asof joins: payload carry is ROW-atomic when individual fields are null") {
    // state@10 is nearest for the probe and has a NULL price; the older
    // state@5 has a price. Per-column carry would stitch sms from @10 with
    // price back-filled from @5 — the whole-row contract emits @10's
    // fields exactly, null price included (round-11 advisor item).
    val probes = Seq(("u1", 12L)).toDF("key", "t")
    val state = Seq(
      ("u1", 5L, Some(9.0), "B"),
      ("u1", 10L, Option.empty[Double], "A")
    ).toDF("key", "st", "price", "sms")
    val back = Relational.asofJoin(probes, state, "key", "t", "st",
        Seq("price", "sms"))
      .select("price", "sms").as[(Option[Double], String)].head()
    assert(back == (None, "A"), s"backward stitched fields: $back")
    val near = Relational.asofJoinNearest(probes, state, "key", "t", "st",
        Seq("price", "sms"))
      .select("price", "sms").as[(Option[Double], String)].head()
    assert(near == (None, "A"), s"nearest stitched fields: $near")
    // forward direction: probe@2, nearest future @5 ("B", 9.0); @10 has
    // null price — atomicity means (9.0, "B"), never a mix
    val fwd = Relational.asofJoinForward(Seq(("u1", 2L)).toDF("key", "t"),
        state, "key", "t", "st", Seq("price", "sms"))
      .select("price", "sms").as[(Option[Double], String)].head()
    assert(fwd == (Some(9.0), "B"), s"forward stitched fields: $fwd")
  }

  test("W4b: paginateAfter equals the offset page when the cursor is the last skipped row") {
    val df = (1 to 100).map(i => (i % 13, i.toLong)).toDF("d", "k")
    val ord = Seq(col("d").desc, col("k").desc)
    val offsetPage = Relational.paginate(df, ord, 10, 5)
      .select("d", "k").as[(Int, Long)].collect().toSeq
    val cursor = Relational.paginate(df, ord, 9, 1)
      .select("d", "k").as[(Int, Long)].head()
    val keysetPage = Relational.paginateAfter(df,
        Seq("d" -> false, "k" -> false),
        Seq(lit(cursor._1), lit(cursor._2)), 5)
      .select("d", "k").as[(Int, Long)].collect().toSeq
    assert(keysetPage == offsetPage)
    // ascending order too
    val ordAsc = Seq(col("d").asc, col("k").asc)
    val offA = Relational.paginate(df, ordAsc, 7, 4)
      .select("d", "k").as[(Int, Long)].collect().toSeq
    val curA = Relational.paginate(df, ordAsc, 6, 1)
      .select("d", "k").as[(Int, Long)].head()
    val keyA = Relational.paginateAfter(df,
        Seq("d" -> true, "k" -> true), Seq(lit(curA._1), lit(curA._2)), 4)
      .select("d", "k").as[(Int, Long)].collect().toSeq
    assert(keyA == offA)
  }

  test("W4b: paginateAfter reaches NULL ordering values and resumes from a NULL cursor") {
    // d: 1..5 plus two NULLs; DESC order puts the null block LAST (Spark
    // default) — pre-fix the three-valued seek made those rows unreachable
    // from every page and a NULL cursor returned an empty page
    val df = (Seq.tabulate(5)(i => (Some(i + 1), (i + 1).toLong)) ++
      Seq((None, 100L), (None, 101L))).toDF("d", "k")
    val ord = Seq(col("d").desc, col("k").desc)
    // walk the whole table in pages of 2: keyset pages must reproduce the
    // offset walk exactly, nulls included
    val all = Relational.paginate(df, ord, 0, 10)
      .select("d", "k").as[(Option[Int], Long)].collect().toSeq
    assert(all.takeRight(2).forall(_._1.isEmpty), s"precondition nulls-last: $all")
    var walked = all.take(2)
    while (walked.length < all.length) {
      val cur = walked.last
      val page = Relational.paginateAfter(df, Seq("d" -> false, "k" -> false),
          Seq(cur._1.map(lit).getOrElse(lit(null).cast("int")), lit(cur._2)), 2)
        .select("d", "k").as[(Option[Int], Long)].collect().toSeq
      assert(page.nonEmpty, s"empty page after cursor $cur")
      walked ++= page
    }
    assert(walked == all, s"keyset walk $walked != offset order $all")
    // ascending: nulls FIRST — after a null cursor come the remaining null
    // ties (by k) and then every non-null value
    val ascPage = Relational.paginateAfter(df, Seq("d" -> true, "k" -> true),
        Seq(lit(null).cast("int"), lit(100L)), 3)
      .select("d", "k").as[(Option[Int], Long)].collect().toSeq
    assert(ascPage == Seq((None, 101L), (Some(1), 1L), (Some(2), 2L)), ascPage.toString)
  }

  test("sessionize: gap starts a new dense 0-based session per key") {
    val ev = Seq(
      ("u1", 0L), ("u1", 10L), ("u1", 100L), // gap 90 > 50 → new session
      ("u1", 120L), ("u2", 5L)
    ).toDF("key", "t")
    val r = Relational.sessionize(ev, "key", "t", gap = 50L)
      .select("key", "t", "session_id").as[(String, Long, Long)]
      .collect().sortBy(x => (x._1, x._2)).toSeq
    assert(r == Seq(
      ("u1", 0L, 0L), ("u1", 10L, 0L), ("u1", 100L, 1L), ("u1", 120L, 1L),
      ("u2", 5L, 0L)))
  }

  test("rangeJoinBinned matches the naive BETWEEN join across bin boundaries") {
    val probes = (0L to 100L by 7).map(t => ("k", t)).toDF("key", "t")
    val intervals = Seq(("k", 5L, 25L, "i1"), ("k", 24L, 30L, "i2"), ("k", 90L, 200L, "i3"))
      .toDF("key", "s", "e", "iid")
    val binned = Relational.rangeJoinBinned(probes, intervals, "t", "s", "e",
        binWidth = 10L, keyCol = Some("key"))
      .select("t", "iid").as[(Long, String)].collect().sorted.toSeq
    val naive = probes.join(intervals, Seq("key"))
      .filter(col("t") >= col("s") && col("t") <= col("e"))
      .select("t", "iid").as[(Long, String)].collect().sorted.toSeq
    assert(binned == naive && binned.nonEmpty)
  }

  test("bucketed table: groupBy on the bucket key plans without a shuffle Exchange") {
    val spark2 = spark
    spark2.sql("DROP TABLE IF EXISTS graft_msgs_bucketed")
    items.write.bucketBy(4, "workflow_id").sortBy("workflow_id", "ts")
      .format("parquet").saveAsTable("graft_msgs_bucketed")
    val agg = spark2.table("graft_msgs_bucketed")
      .groupBy("workflow_id").agg(max(col("ts")).as("m"))
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) { agg.explain() }
    val plan = buf.toString("UTF-8")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed groupBy must not shuffle:\n$plan")
    assert(agg.count() == 2)
  }

  test("mergeable HLL sketches: per-group sketches union to the one-pass sketch") {
    val events = graft.sources.TestData.events(spark, "/root/testdata/sf0.01")
    val global = events
      .selectExpr("hll_sketch_estimate(hll_sketch_agg(user_id)) AS est")
      .as[Long].collect().head
    // pre-aggregate per group (the 100 TB pattern: sketch once, merge later)
    val merged = events.groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .as[Long].collect().head
    assert(merged == global, s"union-of-sketches $merged != one-pass sketch $global")
    val exact = events.agg(countDistinct(col("user_id"))).as[Long].collect().head
    assert(math.abs(merged - exact).toDouble / exact < 0.05)
  }

  test("approx_count_distinct stays within HLL's default 5% rsd of exact") {
    val events = graft.sources.TestData.events(spark, "/root/testdata/sf0.01")
    val r = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx"))
      .as[(Long, Long)].collect().head
    val relErr = math.abs(r._2 - r._1).toDouble / r._1
    assert(relErr < 0.05, s"exact=${r._1} approx=${r._2} relErr=$relErr")
  }

  test("scd2: collapses no-op rows, half-open intervals, one current per key") {
    val log = Seq(
      (1L, 10L, "new"), (1L, 20L, "new"), // no-op: collapsed
      (1L, 30L, "active"), (1L, 40L, "done"),
      (2L, 15L, "new")
    ).toDF("k", "ts", "status")
    val dim = Relational.scd2(log, "k", "ts", Seq("status"))
      .select("k", "status", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(dim == Set(
      (1L, "new", 10L, Some(30L), false),
      (1L, "active", 30L, Some(40L), false),
      (1L, "done", 40L, None, true),
      (2L, "new", 15L, None, true)))
  }

  test("scd2: null attribute transitions are tracked null-safely") {
    val log = Seq(
      (1L, 10L, Option("a")), (1L, 20L, Option.empty[String]), // a → null = change
      (1L, 30L, Option.empty[String]),                         // null → null = no-op
      (1L, 40L, Option("b"))
    ).toDF("k", "ts", "v")
    val dim = Relational.scd2(log, "k", "ts", Seq("v"))
      .select("k", "v", "valid_from").as[(Long, Option[String], Long)]
      .collect().toSet
    assert(dim == Set((1L, Some("a"), 10L), (1L, None, 20L), (1L, Some("b"), 40L)))
  }

  test("scd2 shares one shuffle across both window passes") {
    val log = Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("k", "ts", "v")
    val plan = Relational.scd2(log, "k", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 key shuffle, plan:\n$plan")
  }

  test("mergeIntervals: overlap, touch, containment, and gaps") {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 12L),   // overlap        → [0, 12)
      (1L, 12L, 15L),                 // touching       → joins [0, 15)
      (1L, 1L, 3L),                   // contained      → same group
      (1L, 20L, 25L),                 // gap            → new group
      (2L, 0L, 100L), (2L, 1L, 2L)    // containment across a big span
    ).toDF("k", "s", "e")
    val out = Relational.mergeIntervals(iv, "k", "s", "e")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 0L, 15L, 4L), (1L, 20L, 25L, 1L), (2L, 0L, 100L, 2L)))
  }

  test("mergeIntervals plans a single key shuffle") {
    val iv = Seq((1L, 0L, 10L), (1L, 5L, 12L)).toDF("k", "s", "e")
    val plan = Relational.mergeIntervals(iv, "k", "s", "e")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly 1 key shuffle, plan:\n$plan")
  }

  test("funnel: order matters, chain gates progressively, ties allowed") {
    val ev = Seq(
      // u1 completes in order
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      // u2 has b BEFORE a: step b only counts after a → gated to the later b
      (2L, "b", 5L), (2L, "a", 10L), (2L, "b", 40L), (2L, "c", 50L),
      // u3 breaks at step c (c precedes b's completion)
      (3L, "a", 10L), (3L, "c", 15L), (3L, "b", 20L),
      // u4 only mid-funnel events, never signs up
      (4L, "b", 10L), (4L, "c", 20L),
      // u5 same-ts ties count (>= gate)
      (5L, "a", 10L), (5L, "b", 10L), (5L, "c", 10L)
    ).toDF("u", "ev", "ms")
    val out = Relational.funnel(ev, "u", "ev", "ms", Seq("a", "b", "c"))
      .select("u", "step_1_ts", "step_2_ts", "step_3_ts", "steps_completed")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, Some(10L), Some(20L), Some(30L), 3)))
    assert(out(2L) == ((2L, Some(10L), Some(40L), Some(50L), 3)))
    assert(out(3L) == ((3L, Some(10L), Some(20L), None, 2)))
    assert(out(4L) == ((4L, None, None, None, 0)))
    assert(out(5L) == ((5L, Some(10L), Some(10L), Some(10L), 3)))
  }

  test("retentionCohorts: first-period cohort, distinct actives per offset") {
    val p = 100L
    val ev = Seq(
      (1L, 10L), (1L, 150L), (1L, 151L), (1L, 320L), // cohort 0: offsets 0,1,1,3
      (2L, 120L), (2L, 250L),                        // cohort 1: offsets 0,1
      (3L, 20L)                                      // cohort 0: offset 0
    ).toDF("u", "ms")
    val out = Relational.retentionCohorts(ev, "u", "ms", p)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }
}
