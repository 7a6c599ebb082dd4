package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-quality operators for ingest pipelines: per-column profiling and
 * rule-based expectation checks with quarantine — the validation gate that
 * decides whether a 100 TB batch lands or bounces.
 *
 * Both are single-pass aggregations (one scan, map-side partials): profiling
 * computes every column's stats in ONE projection (never one job per
 * column), and expectation violations are counted with conditional
 * aggregates in the same pass that tags rows for quarantine.
 */
object DataQuality {

  /**
   * One profile row per requested column: count / nulls / distinct / min /
   * max, computed in a single aggregation pass and unpivoted. Min/max/
   * distinct are rendered as strings so heterogeneous column types stack.
   *
   * Exact distinct is `size(collect_set)` rather than N `count_distinct`s:
   * multiple distinct aggregates plan through Spark's Expand operator
   * (input × (N+1) rows through the agg — the whole batch re-shuffled N
   * extra times), while collect_set keeps one in-memory set per column per
   * partition with map-side partials and NO Expand. State is O(cardinality)
   * per column, which is what profiling columns look like; for genuinely
   * high-cardinality columns (ids, free text) pass `approxDistinct = true`
   * — the HLL sketch with O(1) state, the 100 TB wide-profile default.
   */
  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    val aggs = cols.flatMap { c =>
      val dist =
        if (approxDistinct) approx_count_distinct(col(c))
        else size(collect_set(col(c))).cast("long")
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        count(when(col(c).isNull, 1)).as(s"__null_$c"),
        dist.as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__cnt_$c").as("n_nonnull"),
        col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** A named row-level expectation. */
  final case class Rule(name: String, predicate: Column)

  /** Per-rule violation counts (one pass, conditional aggregates). */
  def violations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r =>
      count(when(!coalesce(r.predicate, lit(false)), 1)).as(s"__v_${r.name}"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.map(r =>
      struct(lit(r.name).as("rule"), col(s"__v_${r.name}").as("n_violations")))
    one.select(explode(array(rows: _*)).as("v")).select("v.*")
  }

  /**
   * Split a batch into (passing, quarantined): a row is quarantined when ANY
   * rule fails, and carries the list of failed rule names. One scan, no
   * join — the tag column is computed inline.
   */
  def quarantine(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val failed = array(rules.map(r =>
      when(!coalesce(r.predicate, lit(false)), lit(r.name))): _*)
    val tagged = df.withColumn("failed_rules",
      filter(failed, x => x.isNotNull))
    val pass = tagged.filter(size(col("failed_rules")) === 0).drop("failed_rules")
    val quar = tagged.filter(size(col("failed_rules")) > 0)
    (pass, quar)
  }

  /**
   * Robust per-group outlier flagging via the modified z-score
   * 0.6745·(x − median)/MAD (Iglewicz & Hoaglin, NIST); |z| > threshold
   * flags. Median/MAD resist the very outliers a mean/stddev gate would
   * let drag the fence.
   *
   * Two aggregate passes (median, then median of |x − median|) with the
   * tiny per-group stats broadcast back — never a per-row subquery. The
   * exact `median` swaps for `approx_percentile` at 100 TB per group
   * cardinalities the same way [[profile]]'s distinct does; the z is
   * rounded before thresholding so the flag is reproducible bit-for-bit
   * across engines. MAD = 0 (over half the group identical) yields a null
   * z and an unflagged row.
   */
  /**
   * Winsorize: clip `valueCol` to its [pLow, pHigh] exact interpolated
   * percentiles — tame heavy tails without dropping rows. The two
   * cutpoints are one aggregation collected as driver scalars (same
   * budget as Curation.percentileCutpoints) and ride as literals, so the
   * clip is a pure scalar on the scan; swap in `approx_percentile` at
   * extreme scale. Output rounds to 6 decimals, which also makes the
   * clip boundary engine-stable (a value within 1 ulp of a cutpoint
   * rounds identically whether clipped or not).
   */
  def winsorize(df: DataFrame, valueCol: String,
                pLow: Double = 0.01, pHigh: Double = 0.99,
                outCol: String = "winsorized"): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh,
      s"need 0 <= pLow < pHigh <= 1, got ($pLow, $pHigh)")
    val v = col(valueCol).cast("double")
    val r = df.agg(percentile(v, lit(pLow)), percentile(v, lit(pHigh))).head()
    require(!r.isNullAt(0), "winsorize: no non-null values")
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    df.withColumn(outCol, round(greatest(least(v, lit(hi)), lit(lo)), 6))
  }

  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
                     threshold: Double = 3.5): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(col(groupCol)).agg(median(v).as("__med"))
    val withMed = df.join(broadcast(med), Seq(groupCol))
    val mad = withMed.groupBy(col(groupCol))
      .agg(median(abs(v - col("__med"))).as("__mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("robust_z", when(col("__mad") =!= 0.0,
        round(lit(0.6745) * (v - col("__med")) / col("__mad"), 6)))
      .withColumn("is_outlier",
        coalesce(abs(col("robust_z")) > threshold, lit(false)))
      .withColumn("grp_median", round(col("__med"), 6))
      .withColumn("grp_mad", round(col("__mad"), 6))
      .drop("__med", "__mad")
  }

  /**
   * Population-stability-index drift between a reference and a current
   * sample of the same numeric column — the standard "did the
   * distribution move between snapshots/batches" gate (PSI < 0.1 stable,
   * 0.1–0.25 moderate, > 0.25 drifted).
   *
   * Bins come from the REFERENCE's quantile cutpoints
   * ([[graft.ops.Curation.percentileCutpoints]] — one aggregate, driver
   * holds nBins-1 doubles), so binning both sides is a pure scalar
   * expression: two scans + two nBins-row aggregates, no join of the raw
   * tables, no window. Proportions are add-half smoothed
   * ((n + 0.5) / (N + nBins/2)) so empty bins never divide by zero, and
   * each per-bin term (p_cur − p_ref)·ln(p_cur/p_ref) is rounded to 9 dp
   * for cross-engine reproducibility. Σ terms = the PSI.
   * Output: (bin, n_ref, n_cur, psi_term), bins dense 1..nBins.
   */
  /**
   * Seasonal-profile anomaly detection: each point's z-score against the
   * mean/stddev of its (group, season-bucket) cell — the "is this value
   * unusual FOR THIS HOUR of this metric" gate, which a global z-score
   * gets wrong whenever the series has a daily shape. `seasonCol` is any
   * bucketing expression (hour-of-day by default at the call site).
   *
   * Scale shape: the profile is one aggregation over the corpus
   * (map-side combined) collapsing to |groups|×|buckets| rows, which
   * then BROADCASTS back — the corpus is scanned once and never
   * shuffles for the join. z is rounded (`dp`) so flags replay
   * bit-identically cross-engine (the a14 stats-rounding precedent);
   * cells with stddev 0/NULL or below `minN` points flag nothing (a
   * one-point cell is its own mean — z would be 0/0).
   */
  def seasonalAnomalies(df: DataFrame, groupCol: String, seasonCol: Column,
                        valueCol: String, zThreshold: Double,
                        minN: Long = 2L, dp: Int = 4): DataFrame = {
    val profile = df
      .groupBy(col(groupCol), seasonCol.as("__season"))
      .agg(avg(col(valueCol)).as("__m"),
        stddev_samp(col(valueCol)).as("__sd"),
        count(col(valueCol)).as("__n"))
    val z = round((col(valueCol) - col("__m")) / col("__sd"), dp)
    df.withColumn("__season", seasonCol)
      .join(broadcast(profile), Seq(groupCol, "__season"))
      .filter(col("__sd") > 0 && col("__n") >= minN &&
        abs(z) > zThreshold)
      .withColumn("z", z)
      .drop("__season", "__m", "__sd", "__n")
  }

  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
               nBins: Int = 10): DataFrame = {
    val v = col(valueCol).cast("double")
    val cuts = graft.ops.Curation.percentileCutpoints(ref, v, nBins)
    def counts(df: DataFrame, out: String): DataFrame =
      graft.ops.Curation.binByCutpoints(df.select(v.as("__v")), col("__v"), cuts)
        .groupBy(col("bin")).agg(count(lit(1)).as(out))
    val spine = ref.sparkSession.range(1, nBins + 1).select(col("id").cast("int").as("bin"))
    val joined = spine
      .join(counts(ref, "n_ref"), Seq("bin"), "left")
      .join(counts(cur, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // totals as broadcast scalars via a 1-row cross join: keeps the whole
    // computation one declarative plan (no driver collect of the counts)
    val totals = joined.agg(sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"))
    val half = lit(nBins.toDouble / 2.0)
    joined.crossJoin(broadcast(totals))
      .withColumn("__pr", (col("n_ref") + lit(0.5)) / (col("__tr") + half))
      .withColumn("__pc", (col("n_cur") + lit(0.5)) / (col("__tc") + half))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((col("__pc") - col("__pr")) * log(col("__pc") / col("__pr")), 9)
          .as("psi_term"))
  }
}
