package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Curation operator invariants: deterministic mixing, exact heavy hitters,
  * total-order binning. */
class CurationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("hashUniform is deterministic, in [0,1), and salt-sensitive") {
    val ids = (1L to 200L).toDF("id")
    val u = ids.select(Curation.hashUniform(col("id"), "a").as("u")).as[Double].collect()
    val u2 = ids.select(Curation.hashUniform(col("id"), "a").as("u")).as[Double].collect()
    val v = ids.select(Curation.hashUniform(col("id"), "b").as("u")).as[Double].collect()
    assert(u.toSeq == u2.toSeq)           // pure function of (salt, id)
    assert(u.forall(x => x >= 0.0 && x < 1.0))
    assert(u.toSeq != v.toSeq)            // different salt, different stream
  }

  test("weightedMix keeps ~rate per source and is idempotent on re-run") {
    val docs = (0L until 2000L).map(i => (i, s"src${i % 2}")).toDF("id", "source")
    val mixed = Curation.weightedMix(docs, "id", "source",
      rates = Map("src0" -> 1.0), defaultRate = 0.25)
    val audit = Curation.mixAudit(mixed, "source")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(audit("src0") == ((1000L, 1000L)))           // rate 1.0 keeps all
    val kept1 = audit("src1")._2
    assert(kept1 > 150 && kept1 < 350, s"src1 kept $kept1 of 1000 at rate 0.25")
    // re-running reproduces the exact same sample (no rand() anywhere)
    val again = Curation.mixAudit(
      Curation.weightedMix(docs, "id", "source", Map("src0" -> 1.0), 0.25),
      "source").collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(again("src1") == kept1)
  }

  test("heavyHitters returns exact top-k with deterministic tie order") {
    val words = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d")
    val r = Curation.heavyHitters(words.toDF("w"), col("w"), k = 3)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r == Seq(("a", 5L), ("b", 3L), ("c", 3L))) // b before c on value tiebreak
  }

  test("quantileBins: bins are contiguous, sized within 1, ordered by score") {
    val docs = (1L to 103L).map(i => (i, (i * 7) % 101)).toDF("id", "score")
    val binned = Curation.quantileBins(docs, "id", col("score"), n = 10)
    val sizes = binned.groupBy("bin").count().as[(Int, Long)].collect().toMap
    assert(sizes.keySet == (1 to 10).toSet)
    assert(sizes.values.max - sizes.values.min <= 1) // ntile balance
    // bin boundaries never interleave: max(score) of bin k <= min of bin k+1
    val bounds = binned.groupBy("bin")
      .agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
      .orderBy("bin").as[(Int, Long, Long)].collect()
    bounds.sliding(2).foreach {
      case Array((_, _, hi), (_, lo, _)) => assert(hi <= lo)
      case _ => ()
    }
  }

  // Zipf-ish stream: value v_i appears 2^(9-i) times, i = 0..9, plus a
  // long tail of singletons — heavy head, clear top-k boundary.
  private def zipfStream = {
    val head = (0 until 10).flatMap(i => Seq.fill(1 << (9 - i))(s"hot$i"))
    val tail = (0 until 200).map(i => s"cold$i")
    (head ++ tail).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("rk", "v")
  }

  test("countMinSketch estimates are one-sided and exact when collision-free") {
    val df = zipfStream
    val sketch = Curation.countMinSketch(df, col("v"), depth = 4, width = 4096)
    val exact = df.groupBy(col("v")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Curation.cmEstimate(df.select("v").distinct(), "v", sketch,
        depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (v, n) =>
      assert(est(v) >= n, s"CM undercounted $v: ${est(v)} < $n")
    }
    // 210 distinct into 4x4096 cells: min-of-4 collisions are overwhelmingly
    // unlikely AND deterministic — pin exactness outright
    assert(est == exact)
  }

  test("cmMerge: sketch of a union == cell-wise sum of per-part sketches") {
    val df = zipfStream
    val (a, b) = (df.filter(col("rk") % 2 === 0), df.filter(col("rk") % 2 === 1))
    val merged = Curation.cmMerge(
      Curation.countMinSketch(a, col("v")), Curation.countMinSketch(b, col("v")))
    val whole = Curation.countMinSketch(df, col("v"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("cmTopK matches exact heavyHitters on a skewed stream") {
    val df = zipfStream
    // rate 0.5: the k-th hitter has 16 occurrences, so the deterministic
    // sample catches it (at 0.1 this fixed draw missed all 16 — candidate
    // recall needs rate ≳ a few / count(k-th hitter))
    val got = Curation.cmTopK(df, col("rk"), col("v"), k = 6, sampleRate = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = Curation.heavyHitters(df, col("v"), k = 6)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got.head == (("hot0", 512L)))
  }

  test("cmEstimate of a never-seen value is 0 via left join, not a crash") {
    val sketch = Curation.countMinSketch(zipfStream, col("v"), depth = 4, width = 1 << 20)
    val est = Curation.cmEstimate(Seq("never-seen-xyz").toDF("v"), "v", sketch,
      depth = 4, width = 1 << 20)
    // with a 1M-cell width all 4 cells of an unseen value are empty w.h.p.
    assert(est.collect().head.getLong(1) == 0L)
  }

  test("quotaSample keeps exactly min(quota, |source|) per source, stable under growth") {
    val docs = ((1L to 40L).map(i => (i, "web")) ++ (41L to 45L).map(i => (i, "books")))
      .toDF("id", "source")
    val kept = Curation.quotaSample(docs, "id", "source", quota = 10)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept == Map("web" -> 10L, "books" -> 5L)) // quota caps, small groups intact
    // deterministic + idempotent
    val ids1 = Curation.quotaSample(docs, "id", "source", 10).select("id").as[Long].collect().toSet
    val ids2 = Curation.quotaSample(docs, "id", "source", 10).select("id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // growth stability: adding docs never evicts a survivor whose hash rank
    // stayed within quota — the old sample is a superset test: survivors of
    // the grown corpus that existed before must be survivors of the old one
    val grown = docs.union(Seq((100L, "web"), (101L, "web")).toDF("id", "source"))
    val idsGrown = Curation.quotaSample(grown, "id", "source", 10)
      .select("id").as[Long].collect().toSet
    assert((idsGrown -- Set(100L, 101L)).subsetOf(ids1))
    // the plan must group-limit before the shuffle (partial WindowGroupLimit)
    val plan = Curation.quotaSample(docs, "id", "source", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("corpusShuffle: same salt → identical order; different salt → different order") {
    val docs = (1L to 200L).toDF("id")
    val o1 = Curation.corpusShuffle(docs, "id").select("id").as[Long].collect().toSeq
    val o2 = Curation.corpusShuffle(docs, "id").select("id").as[Long].collect().toSeq
    val o3 = Curation.corpusShuffle(docs, "id", salt = "epoch2")
      .select("id").as[Long].collect().toSeq
    assert(o1 == o2)
    assert(o1 != o3)
    assert(o1.sorted == (1L to 200L)) // a permutation, nothing lost
    assert(o1 != (1L to 200L).toSeq)  // and actually shuffled
  }

  test("interleave: positions are a permutation cycling sources until each exhausts") {
    // 3 sources with different sizes: a x4, b x2, c x1
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"), (6L, "b"), (7L, "c")
    ).toDF("id", "src")
    val out = Curation.interleaveBySource(df, "id", "src")
      .select("id", "src", "pos").as[(Long, String, Long)].collect()
      .sortBy(_._3)
    // positions are a dense 1-based permutation
    assert(out.map(_._3).toSeq == (1L to 7L))
    // round 1 holds all three sources in order; round 2 the survivors;
    // rounds 3-4 only the largest source remains
    assert(out.map(_._2).toSeq == Seq("a", "b", "c", "a", "b", "a", "a"))
    // deterministic under rerun
    val rerun = Curation.interleaveBySource(df, "id", "src")
      .select("id", "pos").as[(Long, Long)].collect().toSet
    assert(rerun == out.map(t => (t._1, t._3)).toSet)
  }

  test("targetMix: exact integer rates hit the budgeted proportions, unlisted sources drop") {
    // 100 min + 100 maj rows; budget 400 at {min: 0.75, maj: 0.25} →
    // rate(min) = 3.0 (exact replication ×3), rate(maj) = 1.0 (keep all);
    // an unlisted third source vanishes
    val df = ((1L to 100L).map((_, "min")) ++ (101L to 200L).map((_, "maj")) ++
      (201L to 210L).map((_, "other"))).toDF("id", "src")
    val out = Curation.targetMix(df, "id", "src",
      targets = Map("min" -> 0.75, "maj" -> 0.25), totalRows = 400L)
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc == Map("min" -> 300L, "maj" -> 100L), bySrc.toString)
    // copies are numbered 0..2 per min row
    val copies = out.filter(col("src") === "min").groupBy("id").count()
      .as[(Long, Long)].collect()
    assert(copies.forall(_._2 == 3L), copies.take(3).mkString(","))
    // fractional rates: expected output ±  deterministic under rerun
    val frac = Curation.targetMix(df, "id", "src",
      targets = Map("min" -> 0.375), totalRows = 400L) // rate 1.5
    val n1 = frac.count()
    assert(n1 > 100 && n1 < 200, n1.toString) // 100 originals + ~50 bernoulli
    assert(frac.count() == n1) // deterministic
    // thinning branch: rate < 1 behaves like weightedMix
    val thin = Curation.targetMix(df, "id", "src",
      targets = Map("maj" -> 0.125), totalRows = 400L) // rate 0.5
    val n2 = thin.count()
    assert(n2 > 25 && n2 < 75, n2.toString)
    assert(thin.select("__copy").distinct().as[Int].collect().toSeq == Seq(0))
  }

  test("interleave: a NULL id fails fast with a named error, never a silent drop") {
    // pre-fix, the inner join-back by id silently dropped NULL-id rows from
    // the output (round-12 advisor item); now the hash guard raises
    val df = Seq((Some(1L), "a"), (None, "a"), (Some(3L), "b"))
      .toDF("id", "src")
    val e = intercept[Exception] {
      Curation.interleaveBySource(df, "id", "src").count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("non-null id")),
      s"expected the named guard error, got: $e")
  }

  test("oversample: floor+bernoulli copies, deterministic, integer rates exact, copies numbered") {
    val df = (1L to 200L).map(i => (i, if (i <= 100) "min" else "maj"))
      .toDF("id", "src")
    val out = Curation.oversample(df, "id", "src",
      rates = Map("min" -> 2.5, "maj" -> 1.0))
    val rows = out.as[(Long, String, Int)].collect()
    val byId = rows.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // integer rate: exactly one copy, numbered 0
    (101L to 200L).foreach(i => assert(byId(i) == Seq(0), s"maj id $i: ${byId(i)}"))
    // fractional rate 2.5: every row has 2 or 3 copies, densely numbered
    (1L to 100L).foreach { i =>
      assert(byId(i) == (0 until byId(i).size) && Set(2, 3)(byId(i).size),
        s"min id $i: ${byId(i)}")
    }
    // expected multiplier ~2.5: the bernoulli extra lands on ~half the ids
    val minTotal = rows.count(_._2 == "min")
    assert(minTotal > 220 && minTotal < 280, s"min copies $minTotal far from 250")
    // deterministic: identical rerun
    val rerun = Curation.oversample(df, "id", "src",
        rates = Map("min" -> 2.5, "maj" -> 1.0))
      .as[(Long, String, Int)].collect()
    assert(rows.toSet == rerun.toSet)
    // rate < 1 degenerates to thinning: 0 or 1 copies, always numbered 0
    val thin = Curation.oversample(df, "id", "src", rates = Map("min" -> 0.4),
        defaultRate = 1.0)
      .as[(Long, String, Int)].collect()
    assert(thin.forall(_._3 == 0))
    val kept = thin.count(_._2 == "min")
    assert(kept > 20 && kept < 60, s"thinned to $kept of 100")
  }

  test("temperatureMix: tau flattens toward uniform, tau=1 keeps proportions") {
    // 90/10 skew between two sources
    val docs = ((1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))).toDF("id", "src")
    def rates(tau: Double) = Curation.temperatureMix(docs, "id", "src", tau, 0.5)
      .select("src", "__keep_rate").distinct()
      .as[(String, Double)].collect().toMap
    val r1 = rates(1.0)
    // tau=1: every source keeps exactly targetFrac
    assert(r1("big") == 0.5 && r1("small") == 0.5)
    val r5 = rates(0.5)
    // tau=0.5 up-weights the minority relative to the majority
    assert(r5("small") > r5("big"))
    assert(r5.values.forall(r => r > 0.0 && r <= 1.0))
    // keep decision is the deterministic hash — reruns agree
    val a = Curation.temperatureMix(docs, "id", "src", 0.5, 0.5)
      .filter(col("__keep")).select("id").as[Long].collect().toSet
    val b = Curation.temperatureMix(docs, "id", "src", 0.5, 0.5)
      .filter(col("__keep")).select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("splitAssign: exhaustive, deterministic, stable under corpus growth") {
    val docs = (1L to 2000L).toDF("id")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val assigned = Curation.splitAssign(docs, "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(assigned.size == 2000) // every row gets exactly one split
    val frac = assigned.values.groupBy(identity).view.mapValues(_.size / 2000.0)
    assert(math.abs(frac("train") - 0.8) < 0.05)
    assert(math.abs(frac("val") - 0.1) < 0.03 && math.abs(frac("test") - 0.1) < 0.03)
    // growing the corpus never flips an existing row's split
    val grown = Curation.splitAssign((1L to 4000L).toDF("id"), "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(assigned.forall { case (id, s) => grown(id) == s })
    // a different salt reshuffles
    val other = Curation.splitAssign(docs, "id", splits, salt = "fold2")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(assigned.exists { case (id, s) => other(id) != s })
    // zero-shuffle scalar plan
    val plan = Curation.splitAssign(docs, "id", splits)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("packSequences: offsets are a consistent concatenation, packs cut at the budget") {
    val docs = (1L to 500L).map(i => (i, 1 + (i * 13 % 97))).toDF("id", "n_tokens")
    val packed = Curation.packSequences(docs, "id", "n_tokens", budget = 512)
      .orderBy("start_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // offsets tile the concatenated stream exactly: each start = prior end
    val total = packed.map(_._2).sum
    assert(packed.head._3 == 0L)
    packed.sliding(2).foreach { case Seq((_, n, s, _), (_, _, s2, _)) =>
      assert(s + n == s2)
    }
    assert(packed.last._3 + packed.last._2 == total)
    // pack assignment is exactly floor(start/budget), so packs advance
    // monotonically and no pack starts past its window
    packed.foreach { case (_, _, s, p) => assert(p == s / 512) }
  }

  test("packSequences: two-phase running sum equals a naive global window") {
    val docs = (1L to 300L).map(i => (i, 1 + (i * 7 % 31))).toDF("id", "n_tokens")
    val twoPhase = Curation.packSequences(docs, "id", "n_tokens", budget = 128)
      .select("id", "start_offset").as[(Long, Long)].collect().toMap
    // naive single-window reference (what a small engine would do)
    import org.apache.spark.sql.expressions.Window
    val naive = docs
      .withColumn("k", md5(col("id").cast("string")))
      .withColumn("start_offset",
        sum(col("n_tokens").cast("long")).over(Window.orderBy("k", "id"))
          - col("n_tokens"))
      .select("id", "start_offset").as[(Long, Long)].collect().toMap
    assert(twoPhase == naive)
  }

  test("packSequences: no unpartitioned window over the corpus in the plan") {
    val docs = (1L to 100L).map(i => (i, 5L)).toDF("id", "n_tokens")
    val plan = Curation.packSequences(docs, "id", "n_tokens", budget = 64)
      .queryExecution.optimizedPlan.toString
    // every corpus-sized Window must carry a partitionSpec; the only
    // global-order window is the ≤256-row bucket prefix sum
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    val unpartitioned = windows.filterNot(_.contains("__bkt#"))
    assert(unpartitioned.forall(_.contains("__bt")), plan)
  }

  test("binByCutpoints agrees with ntile on unique scores, zero shuffles") {
    val docs = (1L to 100L).map(i => (i, (i * 37) % 101)).toDF("id", "score")
    val cuts = Curation.percentileCutpoints(docs, col("score"), n = 10)
    assert(cuts == cuts.sorted && cuts.size == 9)
    val byCut = Curation.binByCutpoints(docs, col("score"), cuts)
      .select("id", "bin").as[(Long, Int)].collect().toMap
    val byNtile = Curation.quantileBins(docs, "id", col("score"), n = 10)
      .select("id", "bin").as[(Long, Int)].collect().toMap
    // 100 unique scores, interior cutpoints interpolate strictly between
    // order statistics: both paths assign identical bins
    assert(byCut == byNtile)
    // scale shape: the binning plan must contain no exchange at all
    val plan = Curation.binByCutpoints(docs, col("score"), cuts)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"binByCutpoints shuffled:\n$plan")
  }

  test("weightedSample: k rows, deterministic, weight-biased") {
    val df = (1L to 2000L).map(i => (i, if (i <= 100) 100.0 else 1.0))
      .toDF("id", "w")
    val s1 = Curation.weightedSample(df, "id", col("w"), k = 100, salt = "t")
      .select("id").as[Long].collect().toSet
    val s2 = Curation.weightedSample(df, "id", col("w"), k = 100, salt = "t")
      .select("id").as[Long].collect().toSet
    assert(s1 == s2, "same corpus + salt must reproduce the same sample")
    assert(s1.size == 100)
    // the 100 heavy rows carry 100/(100+19) ≈ 84% of total weight; A-ES
    // puts far more of them in the sample than their 5% population share
    val heavy = s1.count(_ <= 100L)
    assert(heavy > 30, s"expected heavy-weight rows to dominate, got $heavy/100")
    // a different salt draws a different sample
    val s3 = Curation.weightedSample(df, "id", col("w"), k = 100, salt = "u")
      .select("id").as[Long].collect().toSet
    assert(s1 != s3)
  }

  test("weightedSample plans a top-k, not a global sort") {
    val df = (1L to 100L).map(i => (i, 1.0)).toDF("id", "w")
    val plan = Curation.weightedSample(df, "id", col("w"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("lengthBatches: homogeneous buckets, full batches, deterministic") {
    val df = (1L to 400L).map(i => (i, i)).toDF("id", "len") // lengths 1..400
    val out = Curation.lengthBatches(df, "id", col("len"),
      nBuckets = 4, batchSize = 10, salt = "t")
      .select("id", "n_tokens", "bucket", "batch_id", "pos_in_batch")
      .as[(Long, Long, Int, Long, Int)].collect()
    assert(out.length == 400)
    // quartile buckets of 1..400 are exactly 100 each → 10 full batches
    val perBatch = out.groupBy(_._4).view.mapValues(_.length).toMap
    assert(perBatch.values.forall(_ == 10), s"ragged batches: $perBatch")
    assert(perBatch.size == 40)
    // every batch stays inside one quartile's length range
    out.groupBy(_._4).foreach { case (b, rows) =>
      val lens = rows.map(_._2)
      assert(lens.max - lens.min < 100, s"batch $b spans quartiles: $lens")
    }
    // positions are 0..batchSize-1 within each batch
    out.groupBy(_._4).foreach { case (_, rows) =>
      assert(rows.map(_._5).sorted.toSeq == (0 until 10))
    }
    val again = Curation.lengthBatches(df, "id", col("len"),
      nBuckets = 4, batchSize = 10, salt = "t")
      .select("id", "batch_id").as[(Long, Long)].collect().toMap
    assert(out.map(r => r._1 -> r._4).toMap == again)
  }

  test("tokenBudget: maximal best-first prefix per group, ties on id") {
    val df = Seq(
      // (id, grp, tokens, score) — grp a ranked by score desc: 2, 1, 3
      (1L, "a", 40L, 0.5), (2L, "a", 50L, 0.9), (3L, "a", 30L, 0.1),
      // grp b: tie on score → id order 4, 5
      (4L, "b", 60L, 0.7), (5L, "b", 60L, 0.7), (6L, "b", 10L, 0.6)
    ).toDF("id", "grp", "toks", "score")
    val kept = Curation.tokenBudget(df, "id", "grp", col("toks"), col("score"),
        budget = 100L)
      .select("id", "cum_weight").as[(Long, Long)].collect().toMap
    // a: 2 (cum 50) + 1 (cum 90) fit; 3 would reach 120 → out.
    // b: 4 (cum 60) fits; 5 reaches 120 → out, and the prefix stops there
    // (6 is NOT pulled in past the overflow: prefix semantics, cum 130).
    assert(kept == Map(1L -> 90L, 2L -> 50L, 4L -> 60L), s"got $kept")
    // budget below every doc → empty selection, never a partial doc
    assert(Curation.tokenBudget(df, "id", "grp", col("toks"), col("score"),
      budget = 5L).count() == 0)
  }

  // ---- DSIR importance resampling (Xie et al. 2023) ----

  private def dsirCorpus = Seq(
    // target-like docs: "good" vocabulary
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    (2L, "the quick dog jumps over the brown fox again", "en"),
    (3L, "a lazy brown dog and a quick fox", "en"),
    // off-target docs: disjoint vocabulary
    (4L, "zzz qqq www eee rrr ttt yyy uuu", "xx"),
    (5L, "qqq www zzz rrr eee yyy ttt uuu", "xx"),
    (6L, "mixed doc the quick zzz qqq fox", "mx")
  ).toDF("id", "text", "lang")

  test("dsirLogWeights: target-vocabulary docs outscore off-target docs") {
    val raw = dsirCorpus
    val target = raw.filter(col("lang") === "en")
    val w = Curation.dsirLogWeights(raw, target, "id", "text", buckets = 512)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size == 6)
    // every in-target doc beats every off-target doc; the mixed doc lands between
    assert(Seq(1L, 2L, 3L).map(w).min > w(6L), s"got $w")
    assert(w(6L) > Seq(4L, 5L).map(w).max, s"got $w")
  }

  test("dsirLogWeights: hand-computed smoothed log-ratio replays exactly") {
    val raw = dsirCorpus
    val target = raw.filter(col("lang") === "en")
    val buckets = 64
    // driver-side replay with the same md5 bucketing and smoothing
    def toks(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq
    def grams(s: String) = { val t = toks(s); t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" ")) }
    def bucket(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(g.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    val rows = dsirCorpus.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val rawB = rows.flatMap { case (id, t, _) => grams(t).map(g => (id, bucket(g))) }
    val tgtB = rows.filter(_._3 == "en").flatMap { case (id, t, _) => grams(t).map(g => bucket(g)) }
    val rc = rawB.groupBy(_._2).view.mapValues(_.size).toMap
    val tc = tgtB.groupBy(identity).view.mapValues(_.size).toMap
    val (rt, tt) = (rawB.size.toDouble, tgtB.size.toDouble)
    def lam(b: Long): Double = {
      val l = math.log((tc.getOrElse(b, 0) + 1.0) / (tt + buckets)) -
        math.log((rc.getOrElse(b, 0) + 1.0) / (rt + buckets))
      BigDecimal(l).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = rawB.groupBy(_._1).view.mapValues { bs =>
      val s = bs.map(x => lam(x._2)).sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = Curation.dsirLogWeights(raw, target, "id", "text", buckets = buckets)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("leakageSafeSplit: cluster members share a split; singletons = splitAssign") {
    val docs = (1L to 40L).map(i => (i, s"d$i")).toDF("id", "text")
    // two near-dup clusters: a star {1,2,3} and a pair {10,11}
    val pairs = Seq((1L, 2L), (1L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val clusters = graft.dedup.Dedup.connectedComponents(
      pairs, docs.select(col("id")), "id")
    val split = Curation.leakageSafeSplit(docs, "id", clusters,
      Seq(("train", 0.5), ("val", 0.25), ("test", 0.25)))
    val m = split.select("id", "split").as[(Long, String)].collect().toMap
    assert(Set(m(1L), m(2L), m(3L)).size == 1, "cluster {1,2,3} split apart")
    assert(m(10L) == m(11L), "cluster {10,11} split apart")
    // singletons fall back to their own id = plain splitAssign
    val plain = Curation.splitAssign(docs, "id",
        Seq(("train", 0.5), ("val", 0.25), ("test", 0.25)))
      .select("id", "split").as[(Long, String)].collect().toMap
    (4L to 9L).foreach(i => assert(m(i) == plain(i)))
    // docs ABSENT from the clusters frame also fall back to their own id
    val partial = Curation.leakageSafeSplit(docs, "id",
      clusters.filter(col("id") <= 11L),
      Seq(("train", 0.5), ("val", 0.25), ("test", 0.25)))
      .select("id", "split").as[(Long, String)].collect().toMap
    (12L to 40L).foreach(i => assert(partial(i) == plain(i)))
  }

  test("datasetDiff: simultaneous add+remove visible; one-sided sources zero-fill") {
    val old = Seq((1L, "web", 10L), (2L, "web", 20L), (3L, "books", 5L),
      (4L, "gone", 7L)).toDF("id", "src", "toks")
    val cur = Seq((1L, "web", 10L), (5L, "web", 40L), (3L, "books", 5L),
      (6L, "fresh", 9L)).toDF("id", "src", "toks")
    val d = Curation.datasetDiff(old, cur, "id", "src", col("toks"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // web: lost doc 2 (20 toks), gained doc 5 (40) — net +20, add+remove both visible
    assert(d("web") == ((2L, 2L, 1L, 1L, 20L)), d.toString)
    assert(d("books") == ((1L, 1L, 0L, 0L, 0L)), d.toString)
    assert(d("gone") == ((1L, 0L, 0L, 1L, -7L)), d.toString)
    assert(d("fresh") == ((0L, 1L, 1L, 0L, 9L)), d.toString)
  }

  test("dsirResample: exactly k, deterministic, biased toward the target") {
    val raw = dsirCorpus
    val target = raw.filter(col("lang") === "en")
    val s1 = Curation.dsirResample(raw, target, "id", "text", k = 3, buckets = 512)
      .select("id").as[Long].collect().toSeq
    val s2 = Curation.dsirResample(raw, target, "id", "text", k = 3, buckets = 512)
      .select("id").as[Long].collect().toSeq
    assert(s1.size == 3 && s1 == s2)       // exact k, pure function of the corpus
    // Gumbel noise is bounded in practice by the md5 grid (|g| ≤ ~2.3 at
    // u ∈ [5e-5, 0.99995]); the vocabulary gap here is far wider, so the
    // sample must come from the target-like side
    assert(s1.toSet.subsetOf(Set(1L, 2L, 3L, 6L)), s"got $s1")
  }
}
