package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/**
 * ScalaCheck-generated invariant sweeps (SURVEY §5.3), evaluated in ONE
 * Spark job per property (generate N samples with a fixed seed, run them
 * as a DataFrame, assert over all rows) — scalatest+scalacheck without the
 * scalatestplus bridge.
 */
class PropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val vecGen: Gen[Seq[Float]] = for {
    d <- Gen.choose(1, 64)
    v <- Gen.listOfN(d, Gen.chooseNum(-100.0f, 100.0f))
  } yield v

  test("property: cosine ∈ [-1,1], symmetric, and cos(v,v)=1 for nonzero v") {
    val pairs = samples(Gen.zip(vecGen, vecGen).suchThat { case (a, b) => a.size == b.size || true }, 200)
      .map { case (a, b) => (a, b.take(a.size).padTo(a.size, 1.0f)) }
    val df = pairs.toDF("a", "b")
      .select(
        GraftFunctions.cosineSim(col("a").cast("array<float>"), col("b").cast("array<float>")).as("ab"),
        GraftFunctions.cosineSim(col("b").cast("array<float>"), col("a").cast("array<float>")).as("ba"),
        GraftFunctions.cosineSim(col("a").cast("array<float>"), col("a").cast("array<float>")).as("aa"))
    val rows = df.collect()
    assert(rows.length == pairs.length)
    rows.foreach { r =>
      if (!r.isNullAt(0)) {
        val (ab, ba) = (r.getDouble(0), r.getDouble(1))
        assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9, s"cosine out of range: $ab")
        assert(math.abs(ab - ba) < 1e-12, "cosine must be symmetric")
      }
      if (!r.isNullAt(2)) assert(math.abs(r.getDouble(2) - 1.0) < 1e-6, "cos(v,v) must be 1")
    }
  }

  test("property: chunker covers every char exactly once after de-overlap; sequence dense") {
    val caseGen = for {
      len <- Gen.choose(0, 400)
      s <- Gen.listOfN(len, Gen.asciiPrintableChar).map(_.mkString)
      size <- Gen.choose(1, 60)
      overlap <- Gen.choose(0, size - 1)
    } yield (s, size, overlap)
    samples(caseGen, 80).foreach { case (s, size, overlap) =>
      val cs = Seq(s).toDF("t")
        .select(GraftFunctions.chunkText(col("t"), size, overlap))
        .as[(Int, Int, String)].collect().toSeq
      // chunk_idx dense from 0
      assert(cs.map(_._1) == cs.indices.toSeq)
      // reconstruction
      if (s.length <= size) assert(cs == Seq((0, 0, s)))
      else {
        val rebuilt = cs.map(_._3).zipWithIndex
          .map { case (c, 0) => c; case (c, _) => c.drop(math.min(overlap, c.length)) }
          .mkString
        assert(rebuilt == s, s"size=$size overlap=$overlap")
      }
    }
  }

  test("property: minhash est_jaccard of identical texts is 1; of disjoint alphabets is 0") {
    val wordGen = Gen.listOfN(8, Gen.alphaLowerChar).map(_.mkString)
    val textGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    val texts = samples(textGen, 20)
    val docs = texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i * 2L, t), (i * 2L + 1, t)) // identical twin pairs
    }.toDF("doc_id", "text")
    val sig = graft.dedup.Dedup.minhashSignature(docs, "doc_id", "text", n = 4, numHashes = 6)
    val pairs = texts.indices.map(i => (i * 2L, i * 2L + 1)).toDF("id_a", "id_b")
    val est = graft.dedup.Dedup.minhashJaccard(sig, "doc_id", pairs, 6)
      .select("est_jaccard").as[Double].collect()
    assert(est.length == texts.size && est.forall(_ == 1.0))
  }

  test("property: scrub is idempotent and never lengthens text") {
    val dirtyGen = for {
      parts <- Gen.listOfN(6, Gen.oneOf(
        Gen.alphaNumStr.map(_.take(12)),
        Gen.const("<b>tag</b>"),
        Gen.const("a.b@c.example.com"),
        Gen.const("https://x.example/y?z=1"),
        Gen.const("  \t \n ")))
    } yield parts.mkString(" ")
    val dirty = samples(dirtyGen, 150)
    val r = dirty.toDF("t")
      .select(col("t"),
        graft.text.TextAnalysis.scrub(col("t")).as("once"),
        graft.text.TextAnalysis.scrub(graft.text.TextAnalysis.scrub(col("t"))).as("twice"))
      .as[(String, String, String)].collect()
    assert(r.length == dirty.length)
    r.foreach { case (t, once, twice) =>
      assert(once == twice, s"scrub not idempotent on <$t>: <$once> vs <$twice>")
      assert(once.length <= t.length + 7, // [EMAIL]/[URL] can pad a tiny input
        s"scrub grew <$t> to <$once>")
    }
  }

  test("property: connectedComponents labels are component-minimal on random forests") {
    // deterministic pseudo-random pairs over 30 nodes
    val ids = (0L until 30L).toDF("id0").select(col("id0").as("doc_id"))
    val pairGen = Gen.zip(Gen.choose(0L, 29L), Gen.choose(0L, 29L)).suchThat(p => p._1 != p._2)
    val pairs = samples(pairGen, 25)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val labels = graft.dedup.Dedup.connectedComponents(
        pairs.toDF("id_a", "id_b"), ids, "doc_id")
      .as[(Long, Long)].collect().toMap
    // reference union-find on the driver
    val parent = scala.collection.mutable.Map((0L until 30L).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until 30L).foreach { i =>
      assert(labels(i) == find(i), s"node $i: spark=${labels(i)} uf=${find(i)}")
    }
  }

  test("property: IVF with full probes equals brute-force knn on random data") {
    val vecs = samples(Gen.listOfN(8, Gen.chooseNum(-1.0f, 1.0f)), 120)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val emb = vecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = Array(0.3f, -0.2f, 0.9f, 0.1f, -0.5f, 0.4f, 0.0f, 0.7f)
    val model = graft.rag.Ivf.train(emb, "vec_id", "embedding", nCells = 5, sampleCap = 64)
    val cells = graft.rag.Ivf.withCell(emb, "embedding", model)
    val exact = graft.rag.Rag.knn(emb, "vec_id", "embedding", q, 15, -1.0)
      .select("vec_id").as[Long].collect().toSeq
    val ivf = graft.rag.Ivf.ivfKnn(cells, "vec_id", "embedding", q, model, 15, -1.0,
        nProbe = model.nCells)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf == exact)
  }

  test("property: mergeIntervals equals a driver-side sweep on random intervals") {
    val ivGen = for {
      k <- Gen.choose(1L, 3L)
      s <- Gen.choose(0L, 100L)
      len <- Gen.choose(1L, 30L)
    } yield (k, s, s + len)
    val ivs = samples(ivGen, 60)
    val got = graft.ops.Relational.mergeIntervals(ivs.toDF("k", "s", "e"), "k", "s", "e")
      .as[(Long, Long, Long, Long)].collect().toSet
    // reference: per-key sort + linear sweep on the driver
    val want = ivs.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(identity)
      val acc = scala.collection.mutable.ListBuffer[(Long, Long, Long)]()
      for ((s, e) <- sorted) {
        if (acc.nonEmpty && s <= acc.last._2)
          acc(acc.size - 1) = (acc.last._1, math.max(acc.last._2, e), acc.last._3 + 1)
        else acc += ((s, e, 1L))
      }
      acc.map { case (s, e, n) => (k, s, e, n) }
    }.toSet
    assert(got == want, s"merged=${got.toSeq.sorted} expected=${want.toSeq.sorted}")
  }

  test("property: containment ∈ (0,1], identical docs score 1 both ways, " +
       "and containment ≥ Jaccard on every shared pair") {
    val charGen = Gen.oneOf(('a' to 'h') :+ ' ')
    def textGen(n: Int): Gen[String] = Gen.listOfN(n, charGen).map(_.mkString)
    val cases = samples(for {
      core <- textGen(30)
      flank <- textGen(20)
    } yield (core, core + flank), 40)
    val df = cases.zipWithIndex
      .flatMap { case ((a, b), i) => Seq((i * 2L, a), (i * 2L + 1, b)) }
      .toDF("doc_id", "text")
    val cont = graft.dedup.Dedup.containmentPairs(df, "doc_id", "text",
        n = 5, minContainment = 0.0)
      .as[(Long, Long, Double, Double)].collect()
    val jac = graft.dedup.Dedup.ngramJaccardPairs(df, "doc_id", "text",
        n = 5, minJaccard = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(cont.nonEmpty)
    cont.foreach { case (a, b, cAb, cBa) =>
      assert(a < b, "pair order must be canonical")
      assert(cAb > 0 && cAb <= 1.0 + 1e-9 && cBa > 0 && cBa <= 1.0 + 1e-9,
        s"containment out of range: ($cAb, $cBa)")
      // |A∩B|/|A| ≥ |A∩B|/|A∪B| always — containment dominates Jaccard
      jac.get((a, b)).foreach(j =>
        assert(math.max(cAb, cBa) >= j - 1e-9,
          s"containment $cAb/$cBa below jaccard $j for ($a,$b)"))
    }
    // a doc fully inside its extension: one direction ≈ 1 (every shingle of
    // the core also occurs in core+flank). Only each case's OWN pair
    // (2i, 2i+1) — random cores can coincidentally share shingles across
    // cases, and those pairs carry no containment guarantee
    val full = cont.filter { case (a, b, _, _) => a % 2 == 0 && b == a + 1 }
    assert(full.nonEmpty)
    assert(full.forall { case (_, _, cAb, _) => cAb > 0.999 },
      s"prefix-contained docs must have c_ab ~ 1: ${full.toSeq.take(5)}")
  }

  test("property: tokenStats equals the standalone entropy/LM operators on random corpora") {
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docGen = for {
      n <- Gen.choose(1, 30)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    val docs = samples(docGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    import graft.text.TextAnalysis
    val fused = TextAnalysis.tokenStats(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    val ent = TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    val lm = TextAnalysis.unigramLmScore(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(x => x._1 -> x._3).toMap
    assert(fused.keySet == ent.keySet)
    fused.foreach { case (id, (n, h, lp)) =>
      assert((n, h) == ent(id), s"entropy diverged for $id")
      assert(math.abs(lp - lm(id)) < 1e-9, s"LM diverged for $id")
    }
  }

  test("property: label-propagation communities refine connected components") {
    val edgeGen = for {
      a <- Gen.choose(0L, 30L)
      b <- Gen.choose(0L, 30L) if a != b
    } yield (a, b)
    val edges = samples(edgeGen, 40).distinct.toDF("src", "dst")
    val lpa = graft.ops.Graph.labelPropagation(edges, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    val cc = graft.dedup.Dedup.connectedComponents(
        edges.select(col("src").as("id_a"), col("dst").as("id_b")),
        edges.select(col("src").as("id")).union(edges.select(col("dst")))
          .distinct(), "id")
      .as[(Long, Long)].collect().toMap
    assert(lpa.keySet == cc.keySet, "same node universe")
    // two nodes sharing an LPA label must be in the same component —
    // communities never span components (edges are the only label carrier)
    lpa.groupBy(_._2).values.foreach { members =>
      val comps = members.keys.map(cc).toSet
      assert(comps.size == 1,
        s"LPA community ${members.keys.toSeq.sorted} spans components $comps")
    }
  }

  test("property: winnowing guarantee — docs sharing a substring of length " +
       "≥ w+k-1 share at least one fingerprint") {
    val k = 5; val w = 4
    val charGen = Gen.oneOf(('a' to 'f') :+ ' ')
    def textGen(n: Int): Gen[String] = Gen.listOfN(n, charGen).map(_.mkString)
    // planted: a shared core of exactly w+k-1 chars inside random flanks —
    // the TIGHT bound of the winnowing theorem (Schleimer et al. §3)
    val cases = samples(for {
      core <- textGen(w + k - 1)
      l1 <- textGen(8); r1 <- textGen(8)
      l2 <- textGen(8); r2 <- textGen(8)
    } yield (l1 + core + r1, l2 + core + r2), 100)
    val df = cases.zipWithIndex
      .flatMap { case ((t1, t2), i) => Seq((i * 2L, t1), (i * 2L + 1, t2)) }
      .toDF("doc_id", "text")
    val fps = graft.dedup.Dedup.winnowFingerprints(df, "doc_id", "text", k, w)
      .as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    cases.indices.foreach { i =>
      val (a, b) = (fps.getOrElse(i * 2L, Set.empty), fps.getOrElse(i * 2L + 1, Set.empty))
      assert((a & b).nonEmpty,
        s"case $i: shared ${w + k - 1}-char substring produced no common fingerprint\n" +
          s"doc ${i * 2}: ${cases(i)._1}\ndoc ${i * 2 + 1}: ${cases(i)._2}")
    }
  }

  test("property: countWhere equals the filtered count on random layouts and predicates") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-cw-prop").toString + "/t"
    // skewed values with duplicates and NULL keys, randomly partitioned so
    // file bounds overlap arbitrarily
    val ids = samples(Gen.frequency(
      9 -> Gen.choose(-500L, 500L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long])), 2000)
    val df = ids.zipWithIndex.map { case (id, i) => (id, s"r$i") }
      .toDF("id", "s")
    graft.store.Snapshots.write(df.repartition(7), base, statsKey = Some("id"))
    graft.store.Snapshots.append(df.limit(300).repartition(2), base,
      statsKey = Some("id"))
    val frame = graft.store.Snapshots.read(spark, base)
    val preds = samples(for {
      a <- Gen.choose(-600L, 600L); b <- Gen.choose(-600L, 600L)
      kind <- Gen.choose(0, 5)
    } yield (kind, math.min(a, b), math.max(a, b)), 40).map {
      case (0, lo, _) => col("id") <= lo
      case (1, lo, _) => col("id") < lo
      case (2, _, hi) => col("id") >= hi
      case (3, lo, hi) => col("id") > lo && col("id") <= hi
      case (4, lo, _) => col("id") === lo
      case (_, lo, hi) => col("id") >= lo && col("id") < hi
    }
    preds.foreach { p =>
      val expected = frame.filter(p).count()
      val got = graft.store.Snapshots.countWhere(spark, base, p)
      assert(got == expected, s"pred $p: countWhere=$got filtered=$expected")
    }
  }

  test("property: countWhere equals the filtered count for IN / OR / IS NULL shapes") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-cw-prop2").toString + "/t"
    val ids = samples(Gen.frequency(
      9 -> Gen.choose(-300L, 300L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long])), 1500)
    val df = ids.zipWithIndex.map { case (id, i) => (id, s"r$i") }.toDF("id", "s")
    graft.store.Snapshots.write(df.repartition(6), base, statsKey = Some("id"))
    graft.store.Snapshots.writeBloomSidecars(spark, base, "id",
      expectedItems = 2000L)
    val frame = graft.store.Snapshots.read(spark, base)
    val preds = samples(for {
      vs <- Gen.nonEmptyListOf(Gen.choose(-350L, 350L)).map(_.take(20))
      kind <- Gen.choose(0, 3)
    } yield (kind, vs), 30).map {
      case (0, vs) => col("id").isin(vs.map(java.lang.Long.valueOf): _*)
      case (1, vs) => vs.map(v => col("id") === v).reduce(_ || _)
      case (2, vs) => col("id").isNull || col("id") === vs.head
      case (_, vs) => col("id").isNull && col("s") =!= s"r${vs.head.abs}"
    }
    preds.foreach { p =>
      val expected = frame.filter(p).count()
      val got = graft.store.Snapshots.countWhere(spark, base, p)
      assert(got == expected, s"pred $p: countWhere=$got filtered=$expected")
    }
  }

  test("property: statLeq over the stats canon is value order for every tagged type") {
    // the pruning comparator must agree with the COLUMN's own ordering for
    // longs, doubles, strings, timestamps (epoch-micros canon), and dates
    // (epoch-days canon) — a canon/order mismatch is a silent mis-prune
    import org.apache.spark.sql.functions.{col, expr}
    val longs = samples(Gen.choose(-1000000L, 1000000L), 300)
    val pairs = longs.grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
    val df = pairs.toDF("a", "b").select(
      col("a"), col("b"),
      expr("timestamp_micros(a * 1000000)").as("tsa"),
      expr("timestamp_micros(b * 1000000)").as("tsb"),
      expr("date_add(date '2020-01-01', CAST(a % 10000 AS INT))").as("da"),
      expr("date_add(date '2020-01-01', CAST(b % 10000 AS INT))").as("db"))
    // canonicalize exactly as the stats writers do (via the snapshot layer:
    // write one-row files and read the manifest bounds back)
    val rows = df.collect()
    rows.take(40).foreach { r =>
      val base = java.nio.file.Files.createTempDirectory("graft-canon").toString + "/t"
      val one = Seq((r.getLong(0), r.getTimestamp(2), r.getDate(4)),
        (r.getLong(1), r.getTimestamp(3), r.getDate(5)))
        .toDF("l", "ts", "d")
      graft.store.Snapshots.write(one.repartition(1), base, statsKey = Some("ts"))
      graft.store.Snapshots.writeStatsSidecars(spark, base, Seq("l", "d"))
      // min/max read back through the planner must bracket both rows:
      // countWhere proves it by counting exactly 2 on [min, max] ranges
      // derived from the raw values
      val (lLo, lHi) = (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))
      assert(graft.store.Snapshots.countWhere(spark, base,
        col("l") >= lLo && col("l") <= lHi) == 2L)
      val (tsLo, tsHi) =
        if (r.getTimestamp(2).before(r.getTimestamp(3)))
          (r.getTimestamp(2), r.getTimestamp(3))
        else (r.getTimestamp(3), r.getTimestamp(2))
      assert(graft.store.Snapshots.countWhere(spark, base,
        col("ts") >= tsLo && col("ts") <= tsHi) == 2L)
      // and a point just OUTSIDE the bracket counts zero (pruned or not,
      // the answer is exact)
      assert(graft.store.Snapshots.countWhere(spark, base,
        col("l") > lHi) == 0L)
      assert(graft.store.Snapshots.countWhere(spark, base,
        col("ts") > tsHi) == 0L)
    }
  }

  test("property: deletion-neighborhood blocking finds exactly the brute-force " +
       "edit-distance pairs on random short strings") {
    // the SymSpell theorem the short cohort leans on: ed(s,t) <= k iff the
    // <=k-deletion neighborhoods intersect — verified end-to-end against a
    // driver-side Levenshtein over random <=6-char strings (all inside the
    // short cohort at q=3, k<=2), including empty strings and duplicates
    val strGen = for {
      n <- Gen.choose(0, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i + j)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val strs = samples(strGen, 120).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    for (k <- Seq(1, 2)) {
      val expected = (for {
        (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
        d = lev(sa, sb) if d <= k
      } yield (ia, ib, d)).toSet
      val got = graft.dedup.Dedup.editDistancePairs(
          strs.toDF("id", "s"), "id", "s", maxDist = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected,
        s"k=$k missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("property: topK equals the full order-limit on random layouts") {
    import org.apache.spark.sql.functions.col
    val vals = samples(Gen.frequency(
      8 -> Gen.choose(-1000L, 1000L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long]),
      1 -> Gen.const(Option(7L))), 1200) // heavy ties on 7
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    for ((parts, clustered) <- Seq((5, true), (7, false))) {
      val base = java.nio.file.Files.createTempDirectory("graft-topk-prop").toString + "/t"
      val laid = if (clustered) df.repartitionByRange(parts, col("v"))
                 else df.repartition(parts)
      graft.store.Snapshots.write(laid, base, statsKey = Some("v"))
      val frame = graft.store.Snapshots.read(spark, base)
      for (k <- Seq(1, 13, 200); asc <- Seq(false, true)) {
        val order = (if (asc) col("v").asc else col("v").desc) :: col("id").asc :: Nil
        val expected = frame.orderBy(order: _*).limit(k)
          .select("id").collect().map(_.getLong(0)).toSeq
        val got = graft.store.Snapshots.topK(spark, base, "v", k,
            tieBreak = Seq("id"), ascending = asc)
          .select("id").collect().map(_.getLong(0)).toSeq
        assert(got == expected,
          s"parts=$parts clustered=$clustered k=$k asc=$asc: got ${got.take(8)} vs ${expected.take(8)}")
      }
    }
  }

  test("property: filtered topK equals filter+order+limit on random layouts and predicates") {
    import org.apache.spark.sql.functions.col
    val vals = samples(Gen.frequency(
      8 -> Gen.choose(-1000L, 1000L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long]),
      1 -> Gen.const(Option(7L))), 1200)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val preds = samples(for {
      a <- Gen.choose(-1100L, 1100L); b <- Gen.choose(-1100L, 1100L)
      kind <- Gen.choose(0, 3)
    } yield (kind, math.min(a, b), math.max(a, b)), 12).map {
      case (0, lo, _) => col("v") <= lo
      case (1, _, hi) => col("v") >= hi
      case (2, lo, hi) => col("v") > lo && col("v") <= hi
      // a bounds-invisible residual rides along
      case (_, lo, hi) => col("v") >= lo && col("v") <= hi && col("id") % 3 === 0L
    }
    for ((parts, clustered) <- Seq((5, true), (7, false))) {
      val base = java.nio.file.Files.createTempDirectory("graft-topkw-prop").toString + "/t"
      val laid = if (clustered) df.repartitionByRange(parts, col("v"))
                 else df.repartition(parts)
      graft.store.Snapshots.write(laid, base, statsKey = Some("v"))
      val frame = graft.store.Snapshots.read(spark, base)
      for (p <- preds; k <- Seq(1, 17); asc <- Seq(false, true)) {
        val order = (if (asc) col("v").asc else col("v").desc) :: col("id").asc :: Nil
        val expected = frame.filter(p).orderBy(order: _*).limit(k)
          .select("id").collect().map(_.getLong(0)).toSeq
        val got = graft.store.Snapshots.topK(spark, base, "v", k,
            tieBreak = Seq("id"), ascending = asc, where = Some(p))
          .select("id").collect().map(_.getLong(0)).toSeq
        assert(got == expected,
          s"parts=$parts clustered=$clustered k=$k asc=$asc pred=$p: " +
            s"got ${got.take(8)} vs ${expected.take(8)}")
      }
    }
  }

  test("property: changes/diff replay random churn exactly (state-based CDC)") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-cdc-prop").toString + "/t"
    val n = 600L
    graft.store.Snapshots.write(
      (1L to n).map(i => (i, i * 10.0)).toDF("id", "v")
        .repartitionByRange(5, col("id")),
      base, statsKey = Some("id"))
    // random churn across three commits: CoW update, CoW delete, append
    val updLo = 37L; val updHi = 180L
    graft.store.Snapshots.updateWhere(spark, base,
      col("id").between(updLo, updHi), Seq("v" -> (col("v") + 1.0)))
    graft.store.Snapshots.deleteWhere(spark, base,
      col("id") % 7 === 0L && col("id") <= 300L)
    graft.store.Snapshots.append(
      (1L to 40L).map(i => (n + i, 0.5)).toDF("id", "v"), base)
    val last = graft.store.Snapshots.versions(spark, base).last
    val got = graft.store.Snapshots.changes(spark, base, 1L, last, "id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    // independent replay from the definitions
    val v1 = (1L to n).map(i => i -> (i * 10.0)).toMap
    val v4 = (v1.view.filterKeys(k => !(k % 7 == 0 && k <= 300)).toMap
      .map { case (k, v) => k -> (if (k >= updLo && k <= updHi) v + 1.0 else v) }) ++
      (1L to 40L).map(i => (n + i) -> 0.5).toMap
    val expected =
      v4.view.filterKeys(!v1.contains(_)).map { case (k, v) => (k, v, "insert") }.toSet ++
      v1.view.filterKeys(!v4.contains(_)).map { case (k, v) => (k, v, "delete") }.toSet ++
      v1.keySet.intersect(v4.keySet).filter(k => v1(k) != v4(k)).flatMap(k =>
        Seq((k, v1(k), "update_preimage"), (k, v4(k), "update_postimage"))).toSet
    assert(got == expected,
      s"CDC mismatch: extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
    // diff is the summary projection of the same transition
    val d = graft.store.Snapshots.diff(spark, base, 1L, last, "id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expectedDiff = expected.map {
      case (k, _, "update_preimage") => (k, "update")
      case (k, _, "update_postimage") => (k, "update")
      case (k, _, ct) => (k, ct)
    }
    assert(d == expectedDiff)
  }

  test("property: exactSubstringPairs equals the brute-force gram-set intersection") {
    val minLen = 6
    val charGen = Gen.oneOf('a' to 'e')
    def textGen: Gen[String] =
      Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, charGen)).map(_.mkString)
    val corpus = samples(textGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    // brute force: distinct gram sets per doc, pairwise intersection
    def gramsOf(t: String): Set[String] =
      if (t.length < minLen) Set.empty
      else (0 to t.length - minLen).map(i => t.substring(i, i + minLen)).toSet
    val gsets = corpus.map { case (id, t) => id -> gramsOf(t) }.toMap
    // small alphabet → grams repeat across many docs; df-cap high so the
    // property checks the MATCH itself, not the cap
    val expected = (for {
      (a, ga) <- gsets.toSeq; (b, gb) <- gsets.toSeq if a < b
      shared = (ga & gb).size if shared >= 1
    } yield (a, b) -> ((shared.toLong, (ga & gb).min))).toMap
    val got = graft.dedup.Dedup.exactSubstringPairs(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        minLen = minLen, minShared = 1, maxDf = 1000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    assert(got == expected,
      s"pairs mismatch: extra=${got.keySet -- expected.keySet} " +
        s"missing=${expected.keySet -- got.keySet}")
  }
}
