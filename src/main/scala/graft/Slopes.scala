package graft
import org.apache.spark.sql.SparkSession

/**
 * Scale-slope harness: times a data-bound subset of `SparkEntry.queries` at
 * every available scale factor (sf0.001 / sf0.01 / sf0.1) in ONE session and
 * fits the log-log slope of wall time vs scale factor per query.
 *
 * This is the measured half of SCALE.md's 100 TB argument: a slope ≈ 1 means
 * the operator's cost grows linearly with data (what a scan/hash-agg/
 * broadcast-join pipeline should do); slope < 1 means fixed overhead still
 * dominates at these sizes; slope > 1.3 is the red flag the harness exists to
 * catch — a pairwise/quadratic term (self-join without banding, global sort,
 * driver collect) that local-SF correctness runs can't see. Shuffle bytes get
 * the same treatment: shuffle growing faster than the data is the first thing
 * that kills a 100 TB run even when small-SF wall clock looks fine.
 *
 * Fixture-building queries (snap_*, pipeline_wap_gate, store twins) are
 * excluded on purpose: their wall time is dominated by writing a fresh
 * snapshot fixture, so a slope over the INPUT sf would measure the fixture
 * generator, not the operator. Their scale story is argued in SCALE.md's
 * storage-layout section and pinned by SnapshotsSpec instead.
 *
 * Output: `SLOPES.json` (per-query per-sf seconds + fitted slopes) and one
 * stdout JSON line with the slope distribution summary.
 */
object Slopes {
  // queries whose cost is a function of the input tables (not of a fixture):
  // one representative per family, plus every historically heavy query
  val SlopeSet: Seq[String] = Seq(
    // TPC-H relational core: scan+agg, broadcast join chains, anti/semi
    "tpch_q1_pricing", "tpch_q3_priority", "tpch_q9_profit",
    "tpch_q18_large_orders", "tpch_q21_sole_late_supp",
    // dedup family: signature build, banded LSH, simhash neighbor join,
    // exact hash-groups, n-gram jaccard, span fingerprints
    "dd_minhash_signature", "dd_lsh_candidates", "dd_simhash_neardup",
    "dd_exact_groups", "dd_ngram_jaccard", "dd_span_removal",
    "dd_cluster_labels", "dd_winnow", "dd_winnow_pairs", "dd_winnow_survivors",
    "dd_semdedup", "dd_semdedup_trained",
    // vector family: brute-force knn vs the three index paths
    "v3_knn_cosine", "v3_ann_knn", "v3_ivf_knn", "v3_pq_knn",
    // text analysis: language id, bm25 index build, quality gate, boilerplate
    "ta_language_id", "ta_bm25_index", "ta_quality_gate", "ta_boilerplate",
    // window/sequence/sessionization and the as-of compositions (nearest
    // variant added round-12: its two-directional carry is the
    // shuffle-heaviest as-of — 3.0 MB at sf0.1)
    "w1_sequence_next", "x1_asof_join", "x1c_asof_nearest", "x2_sessionize",
    "x14_funnel",
    // graph iterations (pagerank is the heaviest battery query)
    "g1_khop_reachability", "g3_pagerank",
    // curation + end-to-end pipelines over documents (interleave added
    // round-12 after its shuffle-payload slim — track that the join-back
    // shape holds its slope)
    "cu_pack_sequences", "cu_token_budget", "cu_interleave",
    "pipeline_dataprep", "pipeline_pretraining", "pipeline_neardup_pretraining",
    // profiling + json/event path
    "dq_profile", "f10_json_extract", "t5_hourly_rollup",
    // round-13 additions: the shared-neighbor self-join (pair cost
    // Σ deg²), the corpus-scan batch knn join, the codegen'd
    // canonicalization scan, and the sketch-pair set ops
    "g7_link_prediction", "v11_knn_join", "ta_unicode_norm",
    "a20_hll_set_ops",
    // round-13 second batch: the two corpus-explode DSIR passes (persisted
    // gram aggregates — track that the one-explode-per-corpus shape holds),
    // and the CC-backed cluster-granular split
    "cu_dsir_weights", "cu_leakage_split")

  def main(args: Array[String]): Unit = {
    val root = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDirs: Seq[(Double, String)] =
      Option(new java.io.File(root).listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
        .filter(_.isDirectory)
        .flatMap { d =>
          """^sf([0-9.]+)$""".r.findFirstMatchIn(d.getName)
            .flatMap(m => scala.util.Try(m.group(1).toDouble).toOption)
            .map(_ -> d.getAbsolutePath)
        }
        .sortBy(_._1)
    require(sfDirs.size >= 2, s"need ≥2 sf dirs under $root to fit a slope")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64 * 1024 * 1024}")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def settle(): Unit = {
      var prev = -1L; var n = 0
      while (n < 50 && prev != shuffleBytes.get()) {
        prev = shuffleBytes.get(); Thread.sleep(10); n += 1
      }
    }
    def flushState(): Unit = {
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
    }

    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val names = SlopeSet.filter(n => only.forall(_.contains(n)))
      .filter(SparkEntry.queries.contains)

    // warmup: JVM/codegen startup and every SF dir's parquet footers, so the
    // smallest SF (measured first) isn't billed the cold-start tax — that
    // would bias every slope downward
    spark.range(1000).selectExpr("sum(id)").collect()
    for ((_, dir) <- sfDirs;
         t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      try spark.read.parquet(s"$dir/$t.parquet").count()
      catch { case _: Throwable => () }
    }

    // time = median of 3 (slopes divide two small numbers — a single GC
    // pause on a 0.3 s point would swing the fitted exponent by ±0.3)
    def timeOnce(name: String, dir: String): (Double, Long) = {
      settle()
      val s0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      settle()
      val r = (dt, shuffleBytes.get() - s0)
      flushState()
      r
    }
    def timeMedian3(name: String, dir: String): (Double, Long) = {
      val runs = Seq(timeOnce(name, dir), timeOnce(name, dir), timeOnce(name, dir))
      (runs.map(_._1).sorted.apply(1), runs.map(_._2).max)
    }

    // least-squares slope of ln(t) on ln(sf)
    def fitSlope(points: Seq[(Double, Double)]): Double = {
      val pts = points.filter(p => p._1 > 0 && p._2 > 0)
        .map(p => (math.log(p._1), math.log(p._2)))
      val n = pts.size
      if (n < 2) Double.NaN
      else {
        val mx = pts.map(_._1).sum / n
        val my = pts.map(_._2).sum / n
        val num = pts.map(p => (p._1 - mx) * (p._2 - my)).sum
        val den = pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
        num / den
      }
    }

    def q(s: String): String = "\"" + s + "\""
    def r2(v: Double): String = if (v.isNaN) "null" else f"$v%.2f"

    val rows = names.map { name =>
      val bySf = sfDirs.map { case (sf, dir) =>
        val (t, b) = try timeMedian3(name, dir)
                     catch { case e: Throwable =>
                       System.err.println(s"$name @ sf$sf failed: ${e.getMessage}")
                       (-1.0, -1L) }
        (sf, t, b)
      }
      val ok = bySf.filter(_._2 >= 0)
      val slope = fitSlope(ok.map(p => (p._1, p._2)))
      // the two LARGEST sfs dominate the 100 TB extrapolation (smallest
      // point is mostly fixed overhead); report their pairwise exponent too
      val tail = ok.takeRight(2)
      val tailSlope =
        if (tail.size == 2 && tail.forall(_._2 > 0))
          math.log(tail(1)._2 / tail(0)._2) / math.log(tail(1)._1 / tail(0)._1)
        else Double.NaN
      val shufSlope = fitSlope(ok.filter(_._3 > 0).map(p => (p._1, p._3.toDouble)))
      (name, bySf, slope, tailSlope, shufSlope)
    }

    val detail = rows.map { case (name, bySf, slope, tailSlope, shufSlope) =>
      val times = bySf.map { case (sf, t, _) => s"${q("sf" + sf)}:${r2(t)}" }
        .mkString("{", ",", "}")
      val shuf = bySf.map { case (sf, _, b) =>
        s"${q("sf" + sf)}:${if (b < 0) "null" else ((b / 1048576.0 * 100).round / 100.0).toString}"
      }.mkString("{", ",", "}")
      s"${q(name)}:{${q("sec")}:$times,${q("shuffle_mb")}:$shuf,${q("slope")}:${r2(slope)},${q("tail_slope")}:${r2(tailSlope)},${q("shuffle_slope")}:${r2(shufSlope)}}"
    }.mkString("{", ",", "}")

    val tailSlopes = rows.map(_._4).filter(!_.isNaN).sorted
    def pct(p: Double): Double =
      if (tailSlopes.isEmpty) Double.NaN
      else tailSlopes(math.min(tailSlopes.size - 1, (p * tailSlopes.size).toInt))
    val worst = rows.filter(!_._4.isNaN).sortBy(-_._4).take(3)
      .map(r => s"${q(r._1)}:${r2(r._4)}").mkString("{", ",", "}")

    val sfList = sfDirs.map(_._1).mkString("[", ",", "]")
    val fullJson =
      s"""{"metric":"tail_slope_median","value":${r2(pct(0.5))},"unit":"exponent","sfs":$sfList,"n_queries":${rows.size},"tail_slope_p90":${r2(pct(0.9))},"worst":$worst,"queries":$detail}"""
    // filtered runs are probes, not the committed full-coverage artifact —
    // route them to slopes_smoke.json so a 3-query sf-extension run can
    // never overwrite the 39-query record (same rule as Bench's
    // bench_smoke.json, round-8 advisor item)
    val fileName = if (only.isDefined) "slopes_smoke.json" else "SLOPES.json"
    val path =
      if (new java.io.File("build.sbt").exists()) fileName
      else s"/root/repo/$fileName"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), fullJson + "\n")

    spark.stop()
    println(
      s"""{"metric":"tail_slope_median","value":${r2(pct(0.5))},"unit":"exponent","sfs":$sfList,"n_queries":${rows.size},"tail_slope_p90":${r2(pct(0.9))},"worst":$worst,"detail":"$fileName"}""")
  }
}
