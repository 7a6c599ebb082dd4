package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Driver-contract invariants over the whole battery, enforced at test time
 * (cheap analysis, no execution): every query resolves its plan against the
 * real testdata schemas, output column names are parquet-safe and unique
 * (the driver writes each result to parquet and hash-compares by sorted
 * column name), and every oracle key has a query.
 */
class SparkEntryContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every bench key has a committed bar in tools/baseline.json (round-16: the twice-recurred hygiene lapse, made mechanical)") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/baseline.json")), "UTF-8")
    val bars = """"([A-Za-z][A-Za-z0-9_]*)"\s*:""".r
      .findAllMatchIn(text).map(_.group(1)).toSet // _-prefixed meta keys excluded
    // Bench.scala's benchOnly extras (no DuckDB twin, bench-gated only)
    val benchKeys = SparkEntry.queries.keySet + "dd_hashed_build_probe"
    val unbarred = benchKeys -- bars
    assert(unbarred.isEmpty,
      s"bench keys without a tools/baseline.json bar (set one via the " +
        s"BASELINE.md closing-battery protocol): $unbarred")
    val orphans = bars -- benchKeys
    assert(orphans.isEmpty, s"bars without a bench key: $orphans")
  }

  test("README's advertised query count matches the battery (round-15: the front door can't go stale)") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val advertised = """(\d+) queries""".r.findAllMatchIn(readme)
      .map(_.group(1).toInt).toSeq.distinct
    assert(advertised.nonEmpty, "README must advertise the query count")
    assert(advertised == Seq(SparkEntry.queries.size),
      s"README says $advertised queries; the battery has " +
        s"${SparkEntry.queries.size} - update README.md")
  }

  test("every query's plan analyzes against the sf0.001 schemas") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).schema; None }
      catch { case e: Throwable =>
        Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    }
    assert(failures.isEmpty, s"unresolvable queries:\n${failures.mkString("\n")}")
  }

  test("no battery query plans an unbounded cartesian product") {
    // CartesianProduct = big×big with no join key — the one plan shape that
    // cannot survive scale-up. 1-row broadcast stats frames plan as
    // BroadcastNestedLoopJoin and are fine; a true cartesian must be an
    // explicitly documented brute-force oracle path.
    val allowed = Set(
      "dd_embedding_neardup" // documented brute-force oracle/small-data twin
    )
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct") && !allowed(name)) Some(name) else None
      } catch { case _: Throwable => None } // resolvability is the prior test
    }
    assert(offenders.isEmpty, s"unexpected cartesian in: $offenders")
  }

  test("no battery query plans a single-partition window") {
    // An empty partitionSpec funnels the whole input through one task —
    // the scale-killer WindowExec itself warns about ("No Partition
    // Defined"). Bounded heads are numbered by self-join (Curation
    // .shuffleHead, Rag.rrfFuse) and global prefix sums run two-phase
    // (Curation.packSequences), so NO query may plan one.
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val bad = fn(spark, sf).queryExecution.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
          case g: WindowGroupLimitExec if g.partitionSpec.isEmpty => g
        }
        if (bad.nonEmpty) Some(name) else None
      } catch { case _: Throwable => None } // resolvability is the prior test
    }
    assert(offenders.isEmpty, s"single-partition window in: $offenders")
  }

  test("output column names are parquet-safe, unique, and lowercase") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val cols = fn(spark, sf).schema.fieldNames.toSeq
      val dups = cols.groupBy(identity).collect { case (c, vs) if vs.size > 1 => c }
      val unsafe = cols.filter(c => c.exists(" ,;{}()\n\t=".contains(_)) || c.isEmpty)
      val upper = cols.filter(c => c != c.toLowerCase)
      (dups.map(c => s"$name: duplicate '$c'") ++
        unsafe.map(c => s"$name: parquet-unsafe '$c'") ++
        upper.map(c => s"$name: non-lowercase '$c'")).toSeq
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
