package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.api.Service
import graft.pipeline.{Research, ResearchPipeline}
import graft.store.ConversationStore

/**
 * End-to-end demo of the engine's API surface (§3 query lifecycle):
 * start-research → clarifications → answers → result, then a second
 * workflow with the same query hitting the D1 cache gate. Events are
 * printed as they are emitted (topic ← envelope).
 */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val store = new ConversationStore(spark, Files.createTempDirectory("graft-demo").toString)
    val pipeline = new ResearchPipeline(spark, store, new Research.StubAgents(),
      eventSink = df => df.collect().foreach(r =>
        println(s"EVENT ${r.getAs[String]("topic")} <- ${r.getAs[String]("value").take(120)}")))
    val svc = new Service(store, pipeline)
    val now = Timestamp.valueOf("2026-08-12 00:00:00")

    println("== POST /api/start-research {query: 'vector databases'}")
    val start = svc.startResearch("wf-demo-1", "vector databases", now)
    println(s"-> status=${start.status} questions=${start.clarification_questions}")

    start.clarification_questions.zipWithIndex.foreach { case (q, i) =>
      println(s"== POST /api/answer  Q: $q")
      println(s"-> remaining=${svc.answer("wf-demo-1", s"answer $i", now)}")
    }

    println("== GET /api/status")
    println(s"-> ${svc.status("wf-demo-1")}")

    println("== GET /api/result")
    val res = svc.result("wf-demo-1").toOption.get
    println(s"-> title=${res.title} image=${res.image_file_path}")
    println(res.markdown_report.linesIterator.take(3).mkString("\n"))

    println("== second workflow, same query -> D1 cache gate")
    val out2 = pipeline.run("wf-demo-2", "vector databases", now)
    println(s"-> cacheHit=${out2.cacheHit} existing=${out2.existingResultId}")
    println(s"== tables: conversations=${store.conversations.count()} messages=${store.messages.count()} " +
      s"results=${store.results.count()} links=${store.resultLinks.count()}")
    println("DEMO OK")
    spark.stop()
  }
}
