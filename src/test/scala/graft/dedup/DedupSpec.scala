package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dedup family invariants (exact, shingles, minhash/LSH, simhash, embedding). */
class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup of 1
    (4L, "completely different content about spark engines")
  ).toDF("doc_id", "text")

  test("exact: one survivor (min id) per identical text") {
    val surv = Dedup.exactSurvivors(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(surv == Seq(1L, 3L, 4L))
  }

  test("exact groups report duplicate counts") {
    val g = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toMap
    assert(g(1L) == 2 && g(3L) == 1 && g(4L) == 1)
  }

  test("shingles: distinct char n-grams; short text yields its single short shingle") {
    val sh = Dedup.shingles(Seq((1L, "abcd")).toDF("doc_id", "text"), "doc_id", "text", 3)
      .select("shingle").as[String].collect().sorted.toSeq
    assert(sh == Seq("abc", "bcd"))
    val short = Dedup.shingles(Seq((1L, "ab")).toDF("doc_id", "text"), "doc_id", "text", 3)
      .select("shingle").as[String].collect().toSeq
    assert(short == Seq("ab"))
  }

  test("minhash: identical docs have identical signatures; est_jaccard = 1") {
    val sig = Dedup.minhashSignature(docs, "doc_id", "text", n = 4, numHashes = 8)
    val rows = sig.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(rows(1L) == rows(2L))
    assert(rows(1L) != rows(4L))
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val est = Dedup.minhashJaccard(sig, "doc_id", pairs, 8)
      .select("est_jaccard").as[Double].collect().head
    assert(est == 1.0)
  }

  test("LSH candidates include exact duplicates and block unrelated docs") {
    val sig = Dedup.minhashSignature(docs, "doc_id", "text", n = 4, numHashes = 8)
    val cands = Dedup.lshCandidatePairs(sig, "doc_id", numHashes = 8, bands = 4)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)), "exact dups always share every band")
    assert(!cands.contains((1L, 4L)) || true) // unrelated docs MAY collide; no assertion
  }

  test("ngram jaccard: identical → 1.0; near-dup high; unrelated low") {
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 4, minJaccard = 0.0)
      .as[(Long, Long, Double)].collect().map { case (a, b, v) => (a, b) -> v }.toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.6)
    assert(j.getOrElse((1L, 4L), 0.0) < 0.2)
  }

  test("ngram jaccard maxDf cap drops hot shingles but keeps exact-dup pair") {
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 4, minJaccard = 0.9,
      maxDf = Some(3))
      .as[(Long, Long, Double)].collect().map { case (a, b, v) => (a, b) }.toSet
    assert(j.contains((1L, 2L)))
  }

  test("simhash: identical docs → distance 0; near-dups close; sig deterministic") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(3L)) < hamming(sigs(1L), sigs(4L)))
    val near = Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = 0, bands = 4)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2)).toSet
    assert(near == Set((1L, 2L)))
  }

  test("simhash banded blocking: recall is 1.0 vs all-pairs for Hamming < bands") {
    // maxHamming = 3 < bands = 4 → pigeonhole guarantees every qualifying
    // pair shares an intact band; banded result must equal the all-pairs scan
    // 8 groups of 5 identical docs (hamming 0, always qualifying) plus
    // cross-group variation so blocking actually has work to do
    val corpus = (0 until 40).map { i =>
      (i.toLong, s"token${i % 8} alpha bravo charlie delta echo foxtrot golf hotel india")
    }.toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val allPairs = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3
    } yield (a, b)).toSet
    val banded = Dedup.simhashNearDup(corpus, "doc_id", "text", maxHamming = 3, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == allPairs, "banded blocking must find every pair with hamming < bands")
    assert(allPairs.nonEmpty, "test corpus should contain at least one near-dup pair")
  }

  test("simhash64Local (plain-JVM twin) matches the Column form exactly") {
    val texts = docs.select("text").as[String].collect().toSeq ++
      Seq("", "one", "  spaced   out  ", "punct, marks! and42 digits")
    val colSigs = texts.toDF("text")
      .select(col("text"), Dedup.simhash64(col("text")).as("sig"))
      .as[(String, Long)].collect().toMap
    texts.foreach { t =>
      assert(Dedup.simhash64Local(t) == colSigs(t),
        s"local vs column simhash mismatch for '$t'")
    }
  }

  test("portable md5 simhash: deterministic, 60-bit, identical docs agree") {
    val sigs = Dedup.simhashSignaturesPortable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs.values.forall(s => s >= 0 && s < (1L << Dedup.PortableSigBits)))
    val again = Dedup.simhashSignaturesPortable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sigs == again)
    val near = Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = 0,
      bands = 4, portable = true)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2)).toSet
    assert(near == Set((1L, 2L)))
  }

  test("embedding near-dup: brute force finds the planted duplicate pair") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.999f, 0.04f, 0.0f)),  // near dup of 1
      (3L, Seq(0.0f, 1.0f, 0.0f))
    ).toDF("id", "vec").withColumn("vec", col("vec").cast("array<float>"))
    val pairs = Dedup.embeddingNearDupBruteForce(emb, "id", "vec", minCosine = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("embedding near-dup LSH path finds the same planted pair") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.999f, 0.04f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(-0.5f, -0.5f, 0.7f))
    ).toDF("id", "vec").withColumn("vec", col("vec").cast("array<float>"))
    val planes = graft.rag.Rag.hyperplanes(dim = 3, nBits = 16, seed = 11)
    val pairs = Dedup.embeddingNearDupLsh(emb, "id", "vec", 0.99, planes, maxHamming = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("connectedComponents: chains collapse to min-id components") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    // 1-2, 2-3 (chain), 5-6 (pair), 4 and 7 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs, ids, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("connectedComponents with no pairs: every id is its own cluster") {
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(empty, ids, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("connectedComponents fails fast instead of returning split labels") {
    // a 7-node chain needs >2 propagation rounds; maxIters = 2 must throw,
    // never silently return a partially-propagated labeling
    val ids = (1L to 7L).toDF("doc_id")
    val chain = (1L to 6L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, ids, "doc_id", maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connectedComponentsStars matches min-label propagation on a mixed graph") {
    val ids = (1L to 40L).toDF("doc_id")
    // two chains, a clique, a pair, the rest isolated
    val pairs = ((1L to 9L).map(i => (i, i + 1)) ++
      (20L to 24L).flatMap(a => (a + 1 to 25L).map(b => (a, b))) ++
      Seq((30L, 31L), (12L, 15L), (15L, 13L))).toDF("id_a", "id_b")
    val minLabel = Dedup.connectedComponents(pairs, ids, "doc_id")
      .as[(Long, Long)].collect().toMap
    val stars = Dedup.connectedComponentsStars(pairs, ids, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(stars == minLabel)
  }

  test("connectedComponentsStars converges in O(log d) where min-label needs d rounds") {
    // a 60-node path: min-label at 20 rounds fails fast; star contraction
    // finishes the same graph well inside 15 alternations
    val ids = (1L to 60L).toDF("doc_id")
    val path = (1L to 59L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(path, ids, "doc_id").collect()
    }
    val stars = Dedup.connectedComponentsStars(path, ids, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(stars == (1L to 60L).map(_ -> 1L).toMap)
  }

  test("connectedComponentsStars: empty pair set labels every id to itself") {
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val labels = Dedup.connectedComponentsStars(empty, ids, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("incrementalLshMatches: batch matches corpus twins, never batch-internal pairs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated corpus content about something else entirely")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"), // twin of 1
      (11L, "the quick brown fox jumps over the lazy dog again and again"), // twin of 1 AND 10
      (12L, "nothing like anything in the existing corpus at all whatsoever")
    ).toDF("doc_id", "text")
    val m = Dedup.incrementalLshMatches(
      Dedup.minhashSignature(batch, "doc_id", "text", 5, 4),
      Dedup.minhashSignature(corpus, "doc_id", "text", 5, 4),
      "doc_id", numHashes = 4, bands = 2)
      .as[(Long, Long)].collect().toSet
    assert(m.contains((10L, 1L)) && m.contains((11L, 1L)))
    assert(!m.exists(p => p._1 == 12L))          // no match for the novel doc
    assert(!m.contains((10L, 11L)) && !m.contains((11L, 10L))) // no batch-batch
    // plan: the batch side is the broadcast build side
    val plan = Dedup.incrementalLshMatches(
      Dedup.minhashSignature(batch, "doc_id", "text", 5, 4),
      Dedup.minhashSignature(corpus, "doc_id", "text", 5, 4),
      "doc_id", 4, 2).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("incrementalLshMatchesPrebucketed: parity with the re-signing path on a round-tripped bucket table") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated corpus content about something else entirely")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (12L, "nothing like anything in the existing corpus at all whatsoever")
    ).toDF("doc_id", "text")
    val batchSig = Dedup.minhashSignature(batch, "doc_id", "text", 5, 4)
    val corpusSig = Dedup.minhashSignature(corpus, "doc_id", "text", 5, 4)
    val direct = Dedup.incrementalLshMatches(batchSig, corpusSig, "doc_id", 4, 2)
      .as[(Long, Long)].collect().toSet
    // the steady-state shape: corpus buckets materialized to parquet once
    // (the daily artifact), the batch probes the round-tripped table
    val dir = java.nio.file.Files.createTempDirectory("prebucket").toString
    Dedup.lshBuckets(corpusSig, "doc_id", 4, 2).write.mode("overwrite").parquet(dir)
    val pre = Dedup.incrementalLshMatchesPrebucketed(
      Dedup.lshBuckets(batchSig, "doc_id", 4, 2),
      spark.read.parquet(dir), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pre == direct, s"prebucketed $pre != direct $direct")
    assert(pre.contains((10L, 1L)))
  }

  test("containmentPairs: full excerpt scores ~1 in the short->long direction where Jaccard stays low") {
    val long = "the quick brown fox jumps over the lazy dog while many other " +
      "words pad this much longer document out to a considerable total length"
    val excerpt = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, excerpt),
      (2L, long),
      (3L, "completely unrelated corpus content about something else entirely")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 5, minContainment = 0.4)
      .as[(Long, Long, Double, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"only the excerpt pair qualifies, got ${pairs.toSeq}")
    val (_, _, cAb, cBa) = pairs.head
    assert(cAb > 0.95, s"excerpt-in-long containment must be ~1, got $cAb")
    assert(cBa < 0.5, s"long-in-excerpt containment must be small, got $cBa")
    // the same pair under Jaccard at the same effective threshold: invisible
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 5, minJaccard = 0.95).count()
    assert(jac == 0, "Jaccard at 0.95 misses the excerpt — the gap containment exists to close")
  }

  test("bloomExactAdmission: exact duplicates rejected, novels admitted, false positives confirmed away") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated corpus content about something else entirely")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
      (11L, "a genuinely novel document with vocabulary shared by nobody"),
      (12L, "another brand new entry that the corpus has never seen before")
    ).toDF("doc_id", "text")
    val admitted = Dedup.bloomExactAdmission(batch, corpus, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(11L, 12L), s"got $admitted")
    // pathological bloom (2 expected items, fpp 0.5): novels will bloom-
    // positive as false positives — the confirm join must still admit
    // them, because the RESULT contract is exact regardless of fpp
    val admittedTiny = Dedup.bloomExactAdmission(batch, corpus, "text",
        expectedItems = 2, fpp = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(admittedTiny == Set(11L, 12L), s"fpp-stressed got $admittedTiny")
    // empty corpus: everything is novel, nothing joins
    val allIn = Dedup.bloomExactAdmission(batch, corpus.limit(0), "text")
      .select("doc_id").as[Long].collect().toSet
    assert(allIn == Set(10L, 11L, 12L))
    // NULL-text rows: the anti-join contract (and the oracle's NOT EXISTS)
    // ADMITS them — a null key matches nothing. Before the round-12 fix a
    // null xxhash64 made bloomMightContain null and the row fell through
    // BOTH branch filters: silently dropped, not admitted.
    val withNull = Seq(
      (20L, Option.empty[String]),
      (21L, Some("the quick brown fox jumps over the lazy dog again and again")),
      (22L, Some("yet another fresh document nobody in the corpus has written"))
    ).toDF("doc_id", "text")
    val nullAdmitted = Dedup.bloomExactAdmission(withNull, corpus, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(nullAdmitted == Set(20L, 22L),
      s"null-text row must be admitted as novel, got $nullAdmitted")
  }

  test("bucket artifact layout: partitioned probe matches the flat probe and prunes partitions") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated corpus content about something else entirely"),
      (3L, "a third corpus document with its own vocabulary and phrasing")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("doc_id", "text")
    val corpusBuckets = Dedup.lshBuckets(
      Dedup.minhashSignature(corpus, "doc_id", "text", 5, 4), "doc_id", 4, 2)
    val batchBuckets = Dedup.lshBuckets(
      Dedup.minhashSignature(batch, "doc_id", "text", 5, 4), "doc_id", 4, 2)
    val flat = Dedup.incrementalLshMatchesPrebucketed(
      batchBuckets, corpusBuckets, "doc_id")
      .as[(Long, Long)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("bucketart").toString
    Dedup.writeBucketArtifact(corpusBuckets, dir)
    val probed = Dedup.probeBucketArtifact(batchBuckets, spark, dir, "doc_id")
    assert(probed.as[(Long, Long)].collect().toSet == flat)
    assert(flat.contains((10L, 1L)))
    // the physical claim: the corpus scan carries a partition filter on
    // the bucket-prefix column (dynamic pruning from the broadcast batch),
    // so probe IO is bounded by the batch's prefixes, not the corpus
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("dynamicpruning") || plan.contains("bp#")),
      s"expected a bucket-prefix partition filter in:\n$plan")
  }

  test("hashed signature/bucket twins: identical blocking verdicts on twins and non-dups") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact twin of 1
      (3L, "completely unrelated corpus content about something else entirely")
    ).toDF("doc_id", "text")
    def pairsVia(sig: org.apache.spark.sql.DataFrame,
                 buckets: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val a = buckets.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
      val b = buckets.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
      a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
        .as[(Long, Long)].collect().toSet
    }
    val md5Sig = Dedup.minhashSignature(docs, "doc_id", "text", 5, 4)
    val md5Pairs = pairsVia(md5Sig, Dedup.lshBuckets(md5Sig, "doc_id", 4, 2))
    val hSig = Dedup.minhashSignatureHashed(docs, "doc_id", "text", 5, 4)
    val hPairs = pairsVia(hSig, Dedup.lshBucketsHashed(hSig, "doc_id", 4, 2))
    // exact twins MUST pair under any hash (equal shingle sets -> equal
    // signatures -> equal band buckets); the unrelated doc must not
    assert(md5Pairs == Set((1L, 2L)))
    assert(hPairs == Set((1L, 2L)), s"hashed blocking diverged: $hPairs")
    // the hashed bucket column is a LONG (the 8-byte representation the
    // production artifact exists for)
    assert(Dedup.lshBucketsHashed(hSig, "doc_id", 4, 2)
      .schema("bucket").dataType.typeName == "long")
  }

  test("dedupByCluster keeps the best-scoring doc per component") {
    val corpus = Seq(
      (1L, "short", 5.0), (2L, "longer text", 9.0), (3L, "mid", 7.0),
      (4L, "solo", 1.0)
    ).toDF("doc_id", "text", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs, corpus.select("doc_id"), "doc_id")
    val surv = Dedup.dedupByCluster(corpus, labels, "doc_id", col("quality"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(surv == Seq(2L, 4L)) // 2 wins its 3-doc cluster; 4 survives alone
  }

  test("contamination counts shared train shingles per test doc, zero-fills clean docs") {
    val corpus = Seq(
      (0L, "abcdefgh"), // train
      (1L, "abcdxyzw"), // test: shares exactly the 'abcd' 4-gram
      (2L, "zzzzzz"),   // train
      (3L, "qqqq")      // test: clean, single shingle
    ).toDF("doc_id", "text")
    val r = Dedup.contamination(corpus, "doc_id", "text",
        isTrain = col("doc_id") % 2 === 0, n = 4)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    assert(r == Map(1L -> ((5L, 1L, 0.2)), 3L -> ((1L, 0L, 0.0))))
  }

  test("fuzzyPairs finds typo-level near-dups via shingle blocking, skips far pairs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brwon fox jumps"),  // transposition: dist 2
      (3L, "the quick brown fox jumped"), // suffix edit: dist 2
      (4L, "completely different subject")
    ).toDF("doc_id", "text")
    val r = Dedup.fuzzyPairs(corpus, "doc_id", "text",
        prefixLen = 30, maxDist = 3, n = 5, maxDf = None)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    assert(r == Set((1L, 2L, 2), (1L, 3L, 2), (2L, 3L, 4)).filter(_._3 <= 3),
      s"got $r")
    // doc 4 shares no shingle with the others: never even a candidate
    assert(!r.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("sharedSpanPairs: aligned spans caught, boilerplate capped by maxDf") {
    val span = (1 to 12).map(i => s"tok$i").mkString(" ") // a 12-token run
    val corpus = Seq(
      (1L, s"alpha $span omega"),
      (2L, s"$span beta gamma delta"), // shares the exact 12-token run
      (3L, "unrelated words only here padding filler content more text"),
      (4L, s"x1 x2 x3 $span tail")     // also contains the run
    ).toDF("doc_id", "text")
    // w=4, stride=1: every 4-token window — any shared ≥4-token span hits
    val pairs = Dedup.sharedSpanPairs(corpus, "doc_id", "text",
        w = 4, stride = 1, maxDf = 50)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)), s"got $pairs")

    // a window shared by ALL docs is boilerplate: maxDf = 2 kills it
    val boiler = Seq(
      (1L, s"$span a"), (2L, s"$span b"), (3L, s"$span c")
    ).toDF("doc_id", "text")
    val capped = Dedup.sharedSpanPairs(boiler, "doc_id", "text",
        w = 4, stride = 1, maxDf = 2)
    assert(capped.count() == 0)
  }

  test("removeSharedSpans: shared spans cut, unique text and short docs intact") {
    val span = (1 to 6).map(i => s"dup$i").mkString(" ") // a 6-token run
    val corpus = Seq(
      (1L, s"alpha beta $span gamma"),
      (2L, s"$span delta epsilon zeta"),   // same 6-token run
      (3L, "unrelated words only here padding filler"),
      (4L, "tiny doc")                     // shorter than w: untouched
    ).toDF("doc_id", "text")
    val out = Dedup.removeSharedSpans(corpus, "doc_id", "text", w = 4, minDf = 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // every w-window inside the 6-token run is shared by docs 1 and 2, so
    // exactly those 6 tokens vanish from both; surrounding text survives
    assert(out(1L) == ((1L, 9L, 6L, "alpha beta gamma")), s"got ${out(1L)}")
    assert(out(2L) == ((2L, 9L, 6L, "delta epsilon zeta")), s"got ${out(2L)}")
    assert(out(3L) == ((3L, 6L, 0L, "unrelated words only here padding filler")))
    assert(out(4L) == ((4L, 2L, 0L, "tiny doc")))
  }

  test("removeSharedSpans: a doc that is ALL duplicate text empties out") {
    val span = (1 to 8).map(i => s"b$i").mkString(" ")
    val corpus = Seq((1L, span), (2L, span), (3L, s"$span and a unique tail end"))
      .toDF("doc_id", "text")
    val out = Dedup.removeSharedSpans(corpus, "doc_id", "text", w = 4, minDf = 2)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 8L, 8L, "")))
    assert(out(2L) == ((2L, 8L, 8L, "")))
    assert(out(3L) == ((3L, 13L, 8L, "and a unique tail end")))
  }

  test("winnowFingerprints: matches a driver-side winnowing replay") {
    val k = 4; val w = 3
    val texts = Seq((1L, "abcdefghijabcdefghij"), (2L, "abcdefgh"), (3L, "zzzzz"))
    // driver replay: md5 of every k-gram, min per window of w, distinct
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expect = texts.flatMap { case (id, t) =>
      val hashes = (0 to t.length - k).map(i => md5Hex(t.substring(i, i + k)))
      val wins =
        if (hashes.size <= w) Seq(hashes.min)
        else hashes.sliding(w).map(_.min).toSeq
      wins.distinct.map(id -> _)
    }.toSet
    val got = Dedup.winnowFingerprints(texts.toDF("doc_id", "text"),
        "doc_id", "text", k, w)
      .as[(Long, String)].collect().toSet
    assert(got == expect)
  }

  test("winnowFingerprints: shared long substring ⇒ shared fingerprint; " +
       "sub-k docs vanish") {
    val k = 5; val w = 4
    val shared = "a common duplicated sentence fragment"
    val corpus = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"other beginning $shared different tail"),
      (3L, "entirely unrelated text with nothing in common at all"),
      (4L, "tiny") // shorter than k: no grams, no rows
    ).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(corpus, "doc_id", "text", k, w)
      .as[(Long, String)].collect().toSeq
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // winnowing guarantee: any shared substring of length ≥ w+k-1 shares ≥ 1
    // selected fingerprint
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    assert(!byDoc.contains(4L))
  }

  test("winnowCandidatePairs: near-dup docs pair up, unrelated don't; " +
       "boilerplate fingerprints capped by maxDf") {
    val shared = "a long enough duplicated passage that winnowing must catch"
    val boiler = "standard footer line"
    val corpus = Seq(
      (1L, s"alpha intro $shared and some tail $boiler"),
      (2L, s"beta opening $shared different ending $boiler"),
      (3L, s"gamma unrelated body text with nothing repeated $boiler"),
      (4L, s"delta fully distinct prose about other things $boiler")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowCandidatePairs(corpus, "doc_id", "text",
        k = 8, w = 4, minShared = 2, maxDf = 3)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(pairs.contains((1L, 2L)), s"shared passage must pair 1-2, got $pairs")
    // the footer appears in ALL FOUR docs — over maxDf=3, so it alone must
    // not create pairs among the otherwise-unrelated docs
    assert(!pairs.contains((3L, 4L)), s"boilerplate-only pair leaked: $pairs")
  }

  test("semanticDedup: near-identical vectors in one cluster prune to the min id") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val emb = Seq(
      (1L, v(1.0, 0.0, 0.0, 0.0), 0),
      (2L, v(0.999, 0.01, 0.0, 0.0), 0),  // ~dup of 1 → pruned
      (3L, v(0.0, 1.0, 0.0, 0.0), 1),
      (4L, v(-0.02, 0.998, 0.0, 0.0), 1), // ~dup of 3 → pruned
      (5L, v(0.0, 0.0, 1.0, 0.0), 2)      // alone in its cluster → kept
    ).toDF("vec_id", "embedding", "label")
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", "label",
        minCosine = 0.95)
      .select("id", "cluster", "kept")
      .as[(Long, Int, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 && !out(2L)._3, "vec 2 prunes against smaller-id 1")
    assert(out(3L)._3 && !out(4L)._3, "vec 4 prunes against smaller-id 3")
    assert(out(5L)._3, "singleton cluster keeps its only member")
    assert(out(1L)._2 == out(2L)._2 && out(3L)._2 == out(4L)._2)
    assert(out(1L)._2 != out(3L)._2)
  }

  test("semanticDedup: assignment follows the nearest centroid, not the input label") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    // vec 4 is labeled 1 but sits on cluster 0's axis — nearest-centroid
    // assignment must move it (the label is only the centroid SEED)
    val emb = Seq(
      (1L, v(1.0, 0.0), 0),
      (2L, v(0.98, 0.05), 0),
      (3L, v(0.0, 1.0), 1),
      (4L, v(1.0, 0.02), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", "label",
        minCosine = 0.99)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    assert(out(4L) == out(1L) && out(4L) != out(3L))
  }

  test("editDistancePairs: planted edits found, far pairs excluded, short cohort covered") {
    val rows = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumped"),   // dist 2 from 1 (s→ed)
      (3L, "the quack brown fox jumps"),    // dist 1 from 1
      (4L, "a completely different line"),  // far from everything
      (5L, "ab"),                           // short cohort
      (6L, "abc"),                          // short: dist 1 from 5
      (7L, "xyz")                           // short: far from 5/6
    ).toDF("id", "s")
    val got = Dedup.editDistancePairs(rows, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // 2 vs 3 ("quick…jumped" / "quack…jumps") is 3 edits > 2 → excluded
    assert(got == Set((1L, 2L, 2), (1L, 3L, 1), (5L, 6L, 1)), got.toString)
  }

  test("editDistancePairs: matches brute force on a mutated-string corpus") {
    // deterministic corpus: 60 strings = 12 seeds × 5 hash-driven mutants
    // (substitutions/deletions at hashed positions) — plenty of pairs at
    // every distance, lengths straddling the short-cohort boundary
    val seeds = (0 until 12).map(i => s"seed-$i-" + ("abcdefghij".drop(i % 5)))
    def mutate(s: String, j: Int): String = {
      val h = s"$s:$j".hashCode.abs
      val pos = h % math.max(1, s.length)
      if (j % 3 == 0 && s.length > 3) s.take(pos) + s.drop(pos + 1) // delete
      else s.take(pos) + ('a' + h % 26).toChar + s.drop(pos + 1)    // substitute
    }
    val corpus = seeds.zipWithIndex.flatMap { case (s0, i) =>
      (0 until 5).map(j => ((i * 5 + j).toLong,
        (0 to j % 3).foldLeft(s0)((s, r) => mutate(s, j + r))))
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i + j)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val k = 3
    val expected = (for {
      (ia, sa) <- corpus; (ib, sb) <- corpus if ia < ib
      d = lev(sa, sb) if d <= k
    } yield (ia, ib, d)).toSet
    assert(expected.nonEmpty && expected.size < corpus.size * (corpus.size - 1) / 2)
    val got = Dedup.editDistancePairs(corpus.toDF("id", "s"), "id", "s", maxDist = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected,
      s"missing=${expected -- got}\nextra=${got -- expected}")
  }

  test("editDistancePairs: large short cohort is blocked, never all-pairs") {
    // 400 distinct sub-shortMax strings (4 chars at q=3,k=1 → all in the
    // short cohort) with a handful of planted near-duplicates. The former
    // crossJoin fallback would evaluate 79,800 candidate pairs here (and
    // 10¹⁶ on a 10⁸-title corpus); the deletion-neighborhood block must
    // (a) return exactly the brute-force answer and (b) plan as hash
    // joins — no cartesian/nested-loop node anywhere.
    val base = (0 until 400).map(i => (i.toLong, f"s$i%03d"))
    val planted = Seq((1000L, "s00"), (1001L, "s001x"), (1002L, "s001"))
    val rows = (base ++ planted).toDF("id", "s")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i + j)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val all = base ++ planted
    val expected = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia < ib
      d = lev(sa, sb) if d <= 1
    } yield (ia, ib, d)).toSet
    assert(expected.nonEmpty)
    val q = Dedup.editDistancePairs(rows, "id", "s", maxDist = 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"short cohort planned an all-pairs join:\n$plan")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected,
      s"missing=${expected -- got}\nextra=${got -- expected}")
  }

  test("semanticDedupTrained: a Lloyd iteration moves a boundary vector the seed misassigns") {
    // unit vectors by angle: label-0 mass at {0°, 30°}, label-1 at
    // {45°, 70°, 170°}. The 170° outlier drags label 1's SEED centroid to
    // ~88°, so 45° seeds-assigns to cluster 0 and the partition becomes
    // {0°,30°,45°} / {70°,170°} — whose REFINED centroids sit at ~25° and
    // ~120°. The 70° vector is nearer the seed-1 centroid (18° vs 55°) but
    // nearer the refined-0 centroid (45° vs 50°): training must flip it.
    def u(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val emb = Seq(
      (1L, u(0), 0), (2L, u(30), 0),
      (3L, u(45), 1), (4L, u(70), 1), (5L, u(170), 1)
    ).toDF("vec_id", "embedding", "label")
    val seeded = Dedup.semanticDedup(emb, "vec_id", "embedding", "label",
        minCosine = 0.999)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    val trained = Dedup.semanticDedupTrained(emb, "vec_id", "embedding", "label",
        minCosine = 0.999, lloydIters = 1)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    assert(seeded(4L) == 1, s"fixture: seed centroids must put 70° with label 1, got $seeded")
    assert(trained(4L) == 0, s"refined centroids must reassign the 70° vector, got $trained")
    // the anchors stay put under training
    assert(trained(1L) == 0 && trained(2L) == 0 && trained(5L) == 1)
  }

  test("exactSubstringPairs: verbatim witness, total recall at minLen, df cap") {
    val corpus = Seq(
      (1L, "aaaa SHARED-SEGMENT-ONE zzzz tail-one"),
      (2L, "bbbb SHARED-SEGMENT-ONE yyyy tail-two"),        // shares 1's segment
      (3L, "cccc totally unrelated body of text here"),
      (4L, "dddd SHARED-SEGMENT-ONE xxxx SHARED-SEGMENT-ONE") // shares it twice (same gram set)
    ).toDF("doc_id", "text")
    val pairs = Dedup.exactSubstringPairs(corpus, "doc_id", "text",
      minLen = 18, minShared = 1, maxDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getString(3)))).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 4L), (2L, 4L)),
      s"sharing exactly the segment-bearing grams: ${pairs.keySet}")
    // the witness is the shared text VERBATIM — exactness, not a hash claim
    pairs.values.foreach { case (n, w) =>
      assert(n >= 1L && w.length == 18 && w.contains("SHARED"), s"($n, $w)")
    }
    // minShared filters single-gram coincidences
    assert(Dedup.exactSubstringPairs(corpus, "doc_id", "text",
      minLen = 18, minShared = 100).count() == 0L)
    // a gram present in MORE than maxDf docs never forms pairs (boilerplate
    // guard): with maxDf=2 the 3-doc shared segment is dropped entirely
    assert(Dedup.exactSubstringPairs(corpus, "doc_id", "text",
      minLen = 18, minShared = 1, maxDf = 2).count() == 0L)
    // docs shorter than minLen produce no grams and no failures
    val short = Seq((9L, "tiny")).toDF("doc_id", "text")
    assert(Dedup.exactSubstringPairs(corpus.unionByName(short),
      "doc_id", "text", minLen = 18).count() == 3L)
  }

  test("df caps run as capped-collect buckets, never a window — 30%-boilerplate fixture") {
    // 30% of the corpus shares one license-header gram (the adversarial
    // shape the cap exists for); results must match a per-doc brute-force
    // and the plan must carry NO Window node — a Window.partitionBy(gram)
    // df count would colocate every boilerplate occurrence in one
    // semantically-unsplittable task (AQE cannot split a window partition)
    val header = "SPDX-License-Identifier: Apache-2.0 WITH extra-terms"
    val docs = (1L to 30L).map { i =>
      val body = s"unique body $i " + (s"token$i " * 5) + s"end $i"
      (i, if (i <= 9) s"$header $body" else body)
    } ++ Seq((31L, "aaaa COMMON-RARE-SEGMENT-1 zz one"),
      (32L, "bbbb COMMON-RARE-SEGMENT-1 zz two"))
    val corpus = docs.toDF("doc_id", "text")
    val pairs = Dedup.exactSubstringPairs(corpus, "doc_id", "text",
      minLen = 20, minShared = 1, maxDf = 5)
    assert(!pairs.queryExecution.optimizedPlan.toString.contains("Window"),
      "df cap must not plan a Window")
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 9 header docs pair only through header grams (df=9 > maxDf=5):
    // dropped; the 2-doc rare segment survives
    assert(got == Set((31L, 32L)), s"boilerplate must be capped out: $got")
    // winnow + span paths share the shape and the no-window pin
    val wp = Dedup.winnowCandidatePairs(corpus, "doc_id", "text",
      k = 8, w = 4, minShared = 1, maxDf = 5)
    assert(!wp.queryExecution.optimizedPlan.toString.contains("Window"))
    val sp = Dedup.sharedSpanPairs(corpus, "doc_id", "text",
      w = 3, stride = 1, maxDf = 5)
    assert(!sp.queryExecution.optimizedPlan.toString.contains("Window"))
  }
}
