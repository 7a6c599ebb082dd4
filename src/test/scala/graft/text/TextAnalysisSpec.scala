package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("tokenCount ignores runs of whitespace and edges") {
    val r = Seq("  the  quick \t fox ").toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("n"))
    assert(one[Int](r) == 3)
  }

  test("bpeIshTokenCount splits word pieces, digits, punctuation") {
    val r = Seq("hello, world42!").toDF("t")
      .select(TextAnalysis.bpeIshTokenCount(col("t")).as("n"))
    // hello | , | world42 splits to word/digit boundary pieces | !
    assert(one[Int](r) >= 4)
  }

  test("bpeIshTokenCount == lookaround-split formulation on tricky strings") {
    // the match-counting form must stay exactly (#alnum runs + #non-ws
    // punctuation chars) — the semantics of the original lookaround split
    val cases = Seq("hello, world42!", "a!!b", "  lead trail  ", "a.b.c",
      "", "!!!", "one", "tab\tsep  and\nnewline", "x-1_y=2")
    val got = cases.toDF("t")
      .select(col("t"), TextAnalysis.bpeIshTokenCount(col("t")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    def ref(s: String): Int =
      s.split("(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])").count(_.trim.nonEmpty)
    cases.foreach(c => assert(got(c) == ref(c), s"'$c': got ${got(c)}, want ${ref(c)}"))
  }

  test("typeTokenRatio: all-unique = 1.0; repetition lowers it") {
    val u = Seq("a b c d").toDF("t").select(TextAnalysis.typeTokenRatio(col("t")))
    assert(one[Double](u) == 1.0)
    val rep = Seq("a a a b").toDF("t").select(TextAnalysis.typeTokenRatio(col("t")))
    assert(one[Double](rep) == 0.5)
  }

  test("punctRatio counts ASCII punctuation fraction") {
    val r = Seq("ab,.").toDF("t").select(TextAnalysis.punctRatio(col("t")))
    assert(one[Double](r) == 0.5)
  }

  test("stopwordRatio is case-insensitive token membership") {
    val r = Seq("The cat AND the dog").toDF("t")
      .select(TextAnalysis.stopwordRatio(col("t"), Seq("the", "and")))
    assert(one[Double](r) == 0.6)
  }

  test("languageId picks the profile with the highest marker ratio") {
    val profiles = Map(
      "en" -> Seq("the", "and"),
      "de" -> Seq("der", "und"))
    val r = Seq("der hund und der mann").toDF("t")
      .select(TextAnalysis.languageId(col("t"), profiles))
    assert(one[String](r) == "de")
  }

  test("languageId tie-break is alphabetical-first and deterministic") {
    val profiles = Map("bb" -> Seq("zzz"), "aa" -> Seq("yyy"))
    val r = Seq("no markers at all").toDF("t")
      .select(TextAnalysis.languageId(col("t"), profiles))
    assert(one[String](r) == "aa")
  }

  test("qualityScore lands in [0,1]; garbage scores below clean prose") {
    val df = Seq(
      ("clean", "the quick brown fox jumps over the lazy dog and then the cat sat on the mat with the hat " * 3),
      ("junk", "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))")
    ).toDF("k", "t").select(col("k"),
      TextAnalysis.qualityScore(col("t"), Seq("the", "and", "on", "with")).as("q"))
    val m = df.as[(String, Double)].collect().toMap
    assert(m.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(m("clean") > m("junk"))
  }

  test("fingerprint normalizes case and whitespace runs") {
    val r = Seq(("The  Quick\tFox", "the quick fox")).toDF("a", "b")
      .select((TextAnalysis.fingerprint(col("a")) === TextAnalysis.fingerprint(col("b"))).as("eq"))
    assert(one[Boolean](r))
  }

  test("rollingFingerprints: equal texts agree; shifted text shares windows") {
    val r = Seq(("a b c d e f g h i j k l", "a b c d e f g h i j k l")).toDF("x", "y")
      .select((TextAnalysis.rollingFingerprints(col("x")) ===
        TextAnalysis.rollingFingerprints(col("y"))).as("eq"))
    assert(one[Boolean](r))
  }

  test("scrub strips tags, redacts emails+urls, normalizes whitespace") {
    val dirty = "<div>Hi  there</div> mail bob.smith+x@corp.example.co " +
      "and   see https://ex.org/a?b=1#c  done"
    val r = Seq(dirty).toDF("t").select(TextAnalysis.scrub(col("t")).as("c"))
    assert(one[String](r) == "Hi there mail [EMAIL] and see [URL] done")
  }

  test("scrub is identity on already-clean prose") {
    val clean = "plain text with no markup at all"
    val r = Seq(clean).toDF("t").select(TextAnalysis.scrub(col("t")).as("c"))
    assert(one[String](r) == clean)
  }

  test("repetitionStats: counts, ratio, and max token frequency; empty text zero-fills") {
    val docs = Seq(
      (1L, "a a a b"),   // 4 tokens, 2 distinct, ratio 0.5, max freq 3
      (2L, "x y z"),     // no repetition
      (3L, "")           // degenerate: no tokens at all
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getInt(1), x.getInt(2), x.getDouble(3), x.getLong(4))))
      .toMap
    assert(r(1L) == ((4, 2, 0.5, 3L)))
    assert(r(2L) == ((3, 3, 0.0, 1L)))
    assert(r(3L) == ((0, 0, 0.0, 0L)))
  }

  test("boilerplate: grams shared across a source flag; cross-source sharing does not") {
    val docs = Seq(
      (1L, "a", "nav bar home link unique one"),
      (2L, "a", "nav bar home link unique two"),
      (3L, "a", "nav bar home link unique three"),
      (4L, "b", "nav bar home link other text"),   // same gram, different source
      (5L, "b", "totally different words here now")
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.boilerplate(docs, "doc_id", "text", "source",
        n = 2, minDocs = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    // source a: "nav bar", "bar home", "home link", "link unique" in all 3
    assert(r(1L)._2 == 4L && r(2L)._2 == 4L && r(3L)._2 == 4L)
    assert(r(1L)._1 == 5L && r(1L)._3 == 0.8)
    // source b never reaches minDocs — even though doc 4 shares the grams
    assert(r(4L)._2 == 0L && r(5L)._2 == 0L)
  }

  test("boilerplate: docs shorter than n grams get zero counts, no nulls") {
    val docs = Seq((1L, "one", "s"), (2L, "two words", "s"), (3L, "two words", "s"),
      (4L, "two words", "s")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.boilerplate(docs, "doc_id", "text", "source",
        n = 2, minDocs = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r(1L) == ((0L, 0L, 0.0)))        // 1 token → no bigram, ratio 0
    assert(r(2L) == ((1L, 1L, 1.0)))        // "two words" in 3 docs → flagged
  }

  test("tokenEntropy: uniform tokens max out, repetition scores low, hand-checked") {
    val docs = Seq(
      (1L, "a b c d"),        // uniform: H = ln 4
      (2L, "a a a a"),        // degenerate: H = 0
      (3L, "a a b b c c d d") // uniform over 4: H = ln 4
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(x => x._1 -> x._3).toMap
    val ln4 = BigDecimal(math.log(4)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1L) == ln4 && r(3L) == ln4)
    assert(r(2L) == 0.0)
    // entropy is invariant to length at fixed distribution, sensitive to skew
    val skew = TextAnalysis.tokenEntropy(
      Seq((9L, "a a a a a a b")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect().head._3
    assert(skew > 0.0 && skew < ln4)
  }

  test("unigramLmScore: common-token docs score higher; hand-checked value") {
    // corpus: "the" ×3, "cat" ×2, "dog" ×2, "zyx" ×1 → total 8
    val docs = Seq(
      (1L, "the the cat"),   // avg(2·ln 3 + ln 2)/3 - ln 8
      (2L, "the cat dog"),
      (3L, "zyx dog")        // contains the rarest token
    ).toDF("doc_id", "text")
    val r = TextAnalysis.unigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(x => x._1 -> x._3).toMap
    assert(r(1L) > r(2L) && r(2L) > r(3L))
    val expected1 = BigDecimal((math.log(3) * 2 + math.log(2)) / 3 - math.log(8))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r(1L) - expected1) < 1e-9)
    val n = TextAnalysis.unigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(x => x._1 -> x._2).toMap
    assert(n == Map(1L -> 3L, 2L -> 3L, 3L -> 2L))
  }

  test("tokenStats: fused pass matches the standalone entropy/LM operators") {
    val docs = Seq(
      (1L, "the the cat"),
      (2L, "the cat dog"),
      (3L, "zyx dog"),
      (4L, "a a a a"),
      (5L, "")              // no tokens → drops out of all three
    ).toDF("doc_id", "text")
    val fused = TextAnalysis.tokenStats(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    val ent = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    val lm = TextAnalysis.unigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(fused.keySet == ent.keySet && fused.keySet == lm.keySet)
    assert(!fused.contains(5L))
    for ((id, (n, h, lp)) <- fused) {
      assert((n, h) == ent(id), s"entropy branch diverged for doc $id")
      assert(n == lm(id)._1)
      assert(math.abs(lp - lm(id)._2) < 1e-9,
        s"LM branch diverged for doc $id: fused $lp vs standalone ${lm(id)._2}")
    }
  }

  test("readability: simple text outscores polysyllabic text; hand-checked value; empty is null") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran."),
      (2L, "Incontrovertibly multisyllabic terminology obfuscates comprehensibility."),
      (3L, "")
    ).toDF("doc_id", "text")
    val r = docs.select(col("doc_id"),
        TextAnalysis.readability(col("text")).as("f"))
      .as[(Long, Option[Double])].collect().map(x => x._1 -> x._2).toMap
    assert(r(1L).get > r(2L).get, s"simple ${r(1L)} must beat dense ${r(2L)}")
    assert(r(3L).isEmpty, "token-less text scores null")
    // hand check doc 1: 6 words, 2 sentences, 6 vowel groups (e/a/a/e/o/a)
    val expected = BigDecimal(206.835 - 1.015 * 6.0 / 2.0 - 84.6 * 6.0 / 6.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r(1L).get - expected) < 1e-9, s"got ${r(1L)} want $expected")
  }

  test("keywords: rare terms out-rank ubiquitous ones; ubiquitous idf is zero") {
    val docs = Seq(
      (1L, "alpha alpha common unique"),
      (2L, "beta common other"),
      (3L, "gamma common words here")
    ).toDF("doc_id", "text")
    val kw = TextAnalysis.keywords(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toSeq).toMap
    // 'common' is in every doc → idf 0 → never a top keyword when any
    // doc-specific term exists
    assert(!kw(1L).contains("common") && !kw(2L).contains("common"))
    // doc 1: 'alpha' (tf 2, df 1) beats 'unique' (tf 1, df 1)
    assert(kw(1L) == Seq("alpha", "unique"))
    val scores = TextAnalysis.keywords(docs, "doc_id", "text", k = 10)
      .filter($"term" === "common").select("score").as[Double].collect()
    assert(scores.nonEmpty && scores.forall(_ == 0.0))
  }

  test("keywords: at most k per doc, rank is dense from 1, deterministic") {
    val docs = (1L to 40L).map(i =>
      (i, s"w${i % 7} w${i % 5} w${i % 3} filler filler t$i")).toDF("doc_id", "text")
    val a = TextAnalysis.keywords(docs, "doc_id", "text", k = 3)
      .as[(Long, String, Double, Int)].collect().toSeq.sorted
    val b = TextAnalysis.keywords(docs, "doc_id", "text", k = 3)
      .as[(Long, String, Double, Int)].collect().toSeq.sorted
    assert(a == b)
    val byDoc = a.groupBy(_._1)
    assert(byDoc.values.forall(g => g.size <= 3 &&
      g.map(_._4).sorted == (1 to g.size)))
  }

  test("bigramLmScore: hand-checked probabilities, short docs drop out") {
    // corpus: "a b" ×2 and "a c" ×1 → c(a)=3 (as bigram context), V=3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs, "doc_id", "text", addK = 0.5)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc 4 has one token → no bigrams → absent ("solo" still counts in V)
    assert(!out.contains(4L) && out.size == 3)
    val v = 4.0 // distinct tokens: a, b, c, solo
    def lp(c2: Double, c1: Double) = math.log((c2 + 0.5) / (c1 + 0.5 * v))
    assert(math.abs(out(1L)._3 - lp(2, 3)) < 1e-6) // P(b|a) = 2.5/5
    assert(math.abs(out(3L)._3 - lp(1, 3)) < 1e-6) // P(c|a) = 1.5/5
    assert(out(1L)._2 == 1 && out(3L)._2 == 1)
    // the common continuation scores higher than the rare one
    assert(out(1L)._3 > out(3L)._3)
  }

  test("bigramLmScore shares one shuffle between context and pair counts") {
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val plan = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // both windows must stack on the single w1 exchange — the (w1, w2)
    // pair-count window's clustering is satisfied by the w1 partitioning,
    // so exactly one exchange mentions w1
    val n = "Exchange hashpartitioning\\(w1".r.findAllIn(plan).size
    assert(n == 1, s"expected the windows to share one w1 exchange, got $n:\n$plan")
  }

  test("spreadIfUndersplit: repartitions a 1-split frame to an EXPLICIT core " +
       "count (AQE-proof); identity on a well-split frame") {
    val cores = spark.sparkContext.defaultParallelism
    val narrow = Seq((1L, "a"), (2L, "b")).toDF("id", "text").coalesce(1)
    val spread = TextAnalysis.spreadIfUndersplit(narrow, col("id"))
    // explicit-N RepartitionByExpression: numPartitions is pinned in the
    // plan, so AQE cannot coalesce the exchange back to one partition by
    // byte size (the round-9 trap: REPARTITION_BY_COL without N collapsed
    // every small text shuffle to a single task)
    val analyzed = spread.queryExecution.analyzed.toString
    assert(analyzed.contains("RepartitionByExpression [id") &&
      analyzed.contains(s"], $cores"), analyzed)
    assert(spread.rdd.getNumPartitions == cores)
    val wide = Seq.tabulate(64)(i => (i.toLong, "x")).toDF("id", "text")
      .repartition(cores)
    assert(TextAnalysis.spreadIfUndersplit(wide, col("id")) eq wide,
      "a frame with >= cores/2 partitions must pass through untouched")
  }
}
