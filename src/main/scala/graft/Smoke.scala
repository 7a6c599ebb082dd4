package graft
import org.apache.spark.sql.SparkSession

/** Entry-contract smoke: mirrors the driver's t1 check (entry rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"SMOKE entry rows=${rows.length}")
    rows.take(1).foreach(r => println(s"SMOKE first row: ${r.toString.take(400)}"))
    assert(rows.nonEmpty, "entry returned 0 rows")
    println("SMOKE OK")
    spark.stop()
  }
}
