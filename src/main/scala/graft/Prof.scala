package graft
import org.apache.spark.sql.SparkSession

/** Scratch phase-timer registry for [[Prof]] (delete before round close). */
object ProfTimers {
  val t = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  val n = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body finally {
      t.computeIfAbsent(label, _ => new java.util.concurrent.atomic.AtomicLong())
        .addAndGet(System.nanoTime() - t0)
      n.computeIfAbsent(label, _ => new java.util.concurrent.atomic.AtomicLong())
        .addAndGet(1L)
      ()
    }
  }
  def reset(): Unit = { t.clear(); n.clear() }
  def dump(): Unit = {
    import scala.jdk.CollectionConverters._
    t.asScala.toSeq.sortBy(-_._2.get()).foreach { case (k, v) =>
      println(f"  TIMER $k%-28s ${v.get() / 1e9}%7.3f s  n=${n.get(k).get()}")
    }
  }
}

/** Scratch profiling probe (NOT part of the driver contract; delete before
  * round close). Times one query's Spark-job wall vs driver gaps. */
object Prof {
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
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("PROF_OHA", "128"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(j.jobId, (j.time, desc))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobs.get(j.jobId)).foreach { case (t0, desc) =>
          done.add((j.jobId, t0, j.time, desc))
        }
      }
    })
    val names = if (args.nonEmpty) args.toSeq else Seq("snap_diff_cdc")
    for (n <- names) {
      done.clear()
      ProfTimers.reset()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val js = done.asScala.toSeq.sortBy(_._1)
      val jobSum = js.map(j => (j._3 - j._2) / 1e3).sum
      println(f"PROF $n wall=$wall%.2f njobs=${js.size} jobSum=$jobSum%.2f driverGap=${wall - jobSum}%.2f")
      if (n.startsWith("g"))
        println(s"  lastIterations=${graft.ops.Graph.lastIterations.get()}")
      ProfTimers.dump()
      if (sys.env.contains("PROF_JOBS"))
        js.foreach { case (id, s, e, d) =>
          println(f"  job $id%3d ${(e - s) / 1e3}%6.3f s  ${d.take(80)}")
        }
      try spark.catalog.clearCache() catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
