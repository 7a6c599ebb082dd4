package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.store.Snapshots
import graft.dedup.Dedup

/**
 * Snapshot-family scale harness: measures the CORPUS-FLAT claims the main
 * `Slopes` harness deliberately excludes (snap_* battery queries rebuild
 * their fixture inside the query, so an input-SF slope there measures the
 * fixture generator, not the operator).
 *
 * Here the fixture build is SEPARATED from the steady-state operation:
 * for corpora of 5k / 50k / 500k documents (two decades — past the top
 * of the driver testdata), each round builds the corpus snapshot and the
 * materialized LSH bucket artifact ONCE (reported as context; both are
 * expected ~linear), then times the operations whose cost must NOT grow
 * with the corpus:
 *
 *  - `append`: a FIXED 500-doc delta via [[Snapshots.append]] — the
 *    O(delta)+O(#files-manifest) incremental-metadata claim.
 *  - `merge`: a FIXED 100-doc point-key update via [[Snapshots.mergeInto]]
 *    — stats-pruned file discovery should rewrite ~1 file regardless of
 *    corpus size.
 *  - `incr_dedup`: the FIXED delta probed against the materialized corpus
 *    bucket table via [[Dedup.incrementalLshMatchesPrebucketed]] — the
 *    steady-state daily-dedup shape (batch broadcasts; corpus side is one
 *    columnar scan of a 3-column table, prunable by band/bucket layout at
 *    cluster scale).
 *
 * Documents are synthetic (seeded xxhash64 word sampling — deterministic,
 * generated distributed, no driver loop) because the claim under test is
 * a COST shape vs corpus size, not query semantics; the driver testdata
 * stays the sole input for every correctness query. Timed phases take the
 * median of 3 runs. Output: one JSON line + SNAP_SLOPES.json with the
 * per-size seconds and the fitted log-log slope per phase.
 */
object SnapSlopes {
  private val Vocab: Array[String] = {
    // fixed 240-word vocabulary: realistic-ish shingle mass, zero I/O
    val stems = Array(
      "data", "spark", "query", "table", "index", "merge", "append", "scan",
      "shuffle", "broadcast", "partition", "cluster", "vector", "token",
      "corpus", "window", "stream", "batch", "delta", "manifest", "commit",
      "schema", "column", "filter", "join", "group", "order", "limit",
      "hash", "sort", "cache", "plan", "stage", "task", "executor", "driver",
      "memory", "disk", "network", "latency", "throughput", "pipeline",
      "quality", "sample", "weight", "score", "rank", "bucket", "band",
      "signature", "fingerprint", "shingle", "gram", "text", "document",
      "embedding", "cosine", "distance", "nearest", "neighbor", "centroid")
    stems.flatMap(s => Array(s, s + "s", s + "ing", s + "ed"))
  }

  private def syntheticDocs(spark: SparkSession, n: Long, idOffset: Long,
                            seed: Int): DataFrame = {
    val vocabLit = array(Vocab.map(lit): _*)
    spark.range(n)
      .select((col("id") + idOffset).as("doc_id"))
      .withColumn("__len", (pmod(xxhash64(col("doc_id"), lit(seed)), lit(40)) + lit(30)).cast("int"))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), col("__len") - 1),
          i => element_at(vocabLit,
            (pmod(xxhash64(col("doc_id") * 1000 + i, lit(seed)), lit(Vocab.length)) + 1).cast("int")))))
      .select(col("doc_id"), col("text"),
        (pmod(xxhash64(col("doc_id")), lit(20))).cast("int").as("source"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val root = sys.env.getOrElse("SPARK_GRAFT_SNAP_TMP", "tmp/snapslopes")
    val sizes: Seq[Long] =
      if (args.nonEmpty) args(0).split(",").toSeq.map(_.trim.toLong)
      else Seq(5000L, 50000L, 500000L)
    val deltaN = 500L
    val mergeN = 100L

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64 * 1024 * 1024}")
      // the probe's scan side is a compact columnar artifact (hundreds of
      // MB for a 5M-doc corpus) — at the default 128 MB maxPartitionBytes
      // it splits into ~3 read tasks and the probe is PARALLELISM-bound,
      // not work-bound (measured: 27.6 s at 5M docs on 32 idle cores).
      // minPartitionNum floors the split count at core count; the same
      // knob a cluster job sets per executor complement.
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM/codegen warmup

    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median3(f: => Unit): Double = {
      val ts = (1 to 3).map(_ => timeIt(f)).sorted; ts(1)
    }

    val fsRoot = new java.io.File(root)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmrf)
      f.delete(); ()
    }
    rmrf(fsRoot); fsRoot.mkdirs()

    // phase -> size -> median seconds
    val results = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.LinkedHashMap[Long, Double]]()
    def record(phase: String, n: Long, sec: Double): Unit = {
      results.getOrElseUpdate(phase, scala.collection.mutable.LinkedHashMap())(n) = sec
      println(f"[snapslopes] n=$n%7d $phase%-12s ${sec}%8.3f s")
    }

    for (n <- sizes) {
      val base = s"$root/corpus_$n"
      val bucketDir = s"$root/buckets_$n"
      val corpus = syntheticDocs(spark, n, 0L, seed = 7)

      record("build", n, timeIt {
        Snapshots.write(corpus, base, statsKey = Some("doc_id")); ()
      })
      record("bucket_build", n, timeIt {
        // hashed (xxhash64-long) artifact: the md5-string variant measured
        // 815 s build / 33 s probe at the 5M point — a representation tax
        // (32-char hex cells) the production path does not pay
        val sig = Dedup.minhashSignatureHashed(
          Snapshots.read(spark, base), "doc_id", "text", n = 5, numHashes = 8)
        Dedup.withBucketDf(
            Dedup.lshBucketsHashed(sig, "doc_id", numHashes = 8, bands = 4))
          .write.mode("overwrite").parquet(bucketDir)
      })

      // steady-state operations: FIXED-size inputs against the growing corpus
      var deltaTag = 0L
      record("append", n, median3 {
        deltaTag += 1
        val delta = syntheticDocs(spark, deltaN, 10000000L + deltaTag * deltaN, seed = 11)
        Snapshots.append(delta, base, statsKey = Some("doc_id")); ()
      })
      record("merge", n, median3 {
        // point-key update of 100 CONSECUTIVE existing ids — stats pruning
        // should discover ~1 touched file however large the table is
        val upd = syntheticDocs(spark, mergeN, n / 2, seed = 13)
        Snapshots.mergeInto(spark, base, upd, "doc_id"); ()
      })
      // round-15 CDC verbs: the feed over the LAST merge transition — a
      // fixed ~1-file rewrite however large the corpus — must be
      // corpus-flat: [[Snapshots.changes]] reads only each side's
      // non-shared files, and the agg delta is one signed pass over them
      val vsNow = Snapshots.versions(spark, base)
      val (cdcFrom, cdcTo) = (vsNow(vsNow.size - 2), vsNow.last)
      record("cdc_changes", n, median3 {
        Snapshots.changes(spark, base, cdcFrom, cdcTo, "doc_id")
          .write.mode("overwrite").format("noop").save()
      })
      record("cdc_agg_delta", n, median3 {
        Snapshots.incrementalAggDelta(spark, base, cdcFrom, cdcTo,
            "doc_id", Seq("source"), "source")
          .write.mode("overwrite").format("noop").save()
      })
      // round-14 metadata verbs, all FIXED-size against the growing
      // corpus — the claim is corpus-flat (slope ≈ 0): the hybrid count
      // opens boundary files only, top-k admits the best-bounded files
      // only, and the NDV estimate unions per-file sketches (built once,
      // post-merge, so the build also covers rewritten files)
      record("count_where", n, median3 {
        val lo = n / 2
        Snapshots.countWhere(spark, base,
          col("doc_id") >= lo && col("doc_id") < lo + 100); ()
      })
      record("top_k", n, median3 {
        Snapshots.topK(spark, base, "doc_id", 10, tieBreak = Seq("source"))
          .write.mode("overwrite").format("noop").save()
      })
      record("ndv_build", n, timeIt {
        Snapshots.writeNdvSidecars(spark, base, Seq("source")); ()
      })
      record("approx_ndv", n, median3 {
        Snapshots.approxDistinct(spark, base, "source"); ()
      })
      // round-16: a maintenance cycle's sidecar refresh must be O(delta):
      // each iteration rewrites ~1 file (the corpus-flat point merge,
      // measured above) and maintain(ndvCols) rebuilds ONLY the sections
      // the rewrite dropped — the per-file incremental "missing" scan plus
      // a one-file sketch build, however large the corpus. smallBytes=1
      // disables bin-packing so nothing else rewrites inside the timing.
      record("maintain_sidecars", n, median3 {
        val upd = syntheticDocs(spark, mergeN, n / 3, seed = 19)
        Snapshots.mergeInto(spark, base, upd, "doc_id")
        Snapshots.maintain(spark, base, smallBytes = 1L,
          keepSnapshots = 100, ndvCols = Seq("source")); ()
      })
      val corpusBuckets = spark.read.parquet(bucketDir)
      def deltaBuckets() = {
        val delta = syntheticDocs(spark, deltaN, 20000000L, seed = 17)
        Dedup.lshBucketsHashed(
          Dedup.minhashSignatureHashed(delta, "doc_id", "text", n = 5, numHashes = 8),
          "doc_id", 8, 4)
      }
      // maxDf = 100: the hot-bucket cap (stored-df filter — the batch
      // family's boilerplate treatment applied to the incremental probe);
      // without it the synthetic corpus's small vocab makes every probe
      // doc match a constant FRACTION of the corpus and the join output
      // itself grows linearly (measured 24-33 s at 5M docs).
      record("incr_dedup", n, median3 {
        Dedup.incrementalLshMatchesPrebucketed(
          deltaBuckets(), corpusBuckets, "doc_id", maxDf = 100)
          .write.mode("overwrite").format("noop").save()
      })
      val nMatches = Dedup.incrementalLshMatchesPrebucketed(
        deltaBuckets(), corpusBuckets, "doc_id", maxDf = 100).count()
      println(s"[snapslopes] n=$n capped-probe matches = $nMatches")
    }

    // round-15: executor-side sidecar builds must be flat in FILE COUNT at
    // fixed data volume (the former driver-serialized toLocalIterator loop
    // paid a sequential driver write per file — linear in files however
    // small they are). Same corpus bytes, 8/32/128 files; the recorded
    // "n" for this phase IS the file count, so its fitted slope reads
    // seconds-vs-files directly (expect ≈ 0 past the task-launch floor).
    val fcDocs = syntheticDocs(spark, 200000L, 0L, seed = 23)
    for (files <- Seq(8, 32, 128)) {
      val b = s"$root/fc_$files"
      Snapshots.write(fcDocs.repartition(files), b, statsKey = Some("doc_id"))
      // scan-only twin: the same per-file aggregation WITHOUT sidecar
      // writes — isolates the scan's inherent per-file task floor, so
      // build − scanonly reads the WRITE path's file-count cost alone
      // (the executor-side writes; the old driver loop was linear here)
      record("ndv_scanonly_filecount", files.toLong, timeIt {
        Snapshots.read(spark, b)
          .groupBy(input_file_name().as("__f"))
          .agg(expr("hll_sketch_agg(cast(source as string), 14)").as("sk"))
          .write.mode("overwrite").format("noop").save()
      })
      record("ndv_build_filecount", files.toLong, timeIt {
        Snapshots.writeNdvSidecars(spark, b, Seq("source")); ()
      })
    }

    def slope(phase: String): Double = {
      val pts = results(phase).toSeq.map { case (nn, s) =>
        (math.log(nn.toDouble), math.log(math.max(s, 1e-3)))
      }
      val mx = pts.map(_._1).sum / pts.size
      val my = pts.map(_._2).sum / pts.size
      val num = pts.map(p => (p._1 - mx) * (p._2 - my)).sum
      val den = pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
      if (den == 0) 0.0 else num / den
    }

    def q(s: String) = "\"" + s + "\""
    val phasesJson = results.map { case (ph, m) =>
      val pts = m.map { case (nn, s) => s"${q(nn.toString)}:${f"$s%.3f"}" }.mkString("{", ",", "}")
      s"${q(ph)}:{${q("sec")}:$pts,${q("slope")}:${f"${slope(ph)}%.3f"}}"
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"snap_slopes","sizes":${sizes.mkString("[", ",", "]")},"delta_docs":$deltaN,"merge_docs":$mergeN,"phases":$phasesJson}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("SNAP_SLOPES.json"), line + "\n")
    rmrf(fsRoot) // scratch data is ~GB at the top size; don't leave it behind
    spark.stop()
    println(line)
  }
}
