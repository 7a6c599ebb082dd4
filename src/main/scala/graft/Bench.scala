package graft
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and prints
 * ONE JSON line {"metric","value","unit","queries","sf"}.
 *
 * Failures are reported as `null` times plus an "errors" map — a failing
 * query must never look like a fast one (round-1 verdict, "What's wrong" #5).
 * Execution sink is the `noop` format so the full plan (all columns, all
 * operators) executes without count-only pruning and without driver collect.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64 * 1024 * 1024}")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    // untimed warmup: JVM/codegen/parquet-reader startup and first-touch of
    // every table's footers must not be billed to whichever query happens to
    // sort first (a1_next_sequence was absorbing the events.parquet cold read)
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "events", "documents", "embeddings")) {
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => () }
      }
    } catch { case _: Throwable => () }

    // per-query shuffle accounting: stage-level shuffle-write bytes summed
    // between marks — the scale-readiness number next to each wall time
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    // the listener bus is async (and private) — poll the counter until it
    // stops moving so a query's trailing stage events attribute to it
    def settle(): Unit = {
      var prev = -1L; var n = 0
      while (n < 50 && prev != shuffleBytes.get()) {
        prev = shuffleBytes.get(); Thread.sleep(10); n += 1
      }
    }

    val results: Seq[(String, Either[String, (Double, Long)])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        settle()
        val s0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        val r = try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - t0) / 1e9
          settle()
          Right((dt, shuffleBytes.get() - s0))
        } catch {
          case e: Throwable =>
            Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
        name -> r
      }

    val qs = results.map {
      case (k, Right((v, _))) => s"${q(k)}:$v"
      case (k, Left(_)) => s"${q(k)}:null"
    }.mkString("{", ",", "}")
    val shuf = results.collect { case (k, Right((_, b))) =>
      s"${q(k)}:${(b / 1048576.0 * 100).round / 100.0}"
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(m)) => s"${q(k)}:${q(m)}" }
      .mkString("{", ",", "}")
    val ok = results.collect { case (_, Right((v, _))) => v }
    val total = ok.sum
    val nFail = results.size - ok.size

    // regression gate: diff against the committed per-query baseline
    // (tools/baseline.json, written from the previous round's bench). A
    // query is flagged when it's >1.5× its baseline AND the delta is >0.5 s
    // (sub-second queries jitter by whole scheduling quanta run-to-run —
    // absolute noise must not page anyone).
    val baseline: Map[String, Double] = {
      val f = new java.io.File(
        sys.env.getOrElse("SPARK_GRAFT_BASELINE", "tools/baseline.json"))
      if (!f.exists()) Map.empty
      else {
        val txt = scala.io.Source.fromFile(f).mkString
        """"([^"]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }
    val regressions = results.collect {
      case (k, Right((v, _)))
          if baseline.get(k).exists(b => v > b * 1.5 && v - b > 0.5) =>
        s"${q(k)}:{${q("now")}:$v,${q("baseline")}:${baseline(k)}}"
    }.mkString("{", ",", "}")

    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"shuffle_mb":$shuf,"errors":$errs,"regressions":$regressions,"n_failed":$nFail,"sf":${q(sfDir)}}""")
    spark.stop()
    if (nFail > 0) sys.exit(1)
  }
}
