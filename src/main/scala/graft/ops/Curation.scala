package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators: the sampling/mixing/profiling steps a
 * large-scale training-data pipeline runs between dedup and tokenization.
 *
 * Determinism rule: every sampling decision is a pure function of the row
 * (portable md5-derived uniform), never of `rand()` — re-running the
 * pipeline on the same corpus reproduces the same mixture bit-for-bit on
 * any engine (the DuckDB oracles recompute the identical hash), and a
 * backfill on added data never resamples old rows.
 */
object Curation {

  /** Portable uniform in [0, 1): first 15 hex chars of md5 (a 60-bit int,
    * sign-safe) modulo 10^4, scaled. Matches DuckDB
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 10000 / 10000.0`. */
  def hashUniform(key: Column, salt: String): Column =
    (conv(substring(md5(concat(lit(salt + "|"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") % 10000).cast("double") / 10000.0

  /**
   * Domain mixing: keep each row with its source's rate (deterministic
   * Bernoulli by row hash). The core knob of corpus composition — "100% of
   * books, 25% of web" — applied in one scan with zero shuffles: the
   * decision is a scalar expression, so it pushes through to wherever the
   * scan runs and composes with partition pruning.
   */
  def weightedMix(df: DataFrame, idCol: String, sourceCol: String,
                  rates: Map[String, Double], defaultRate: Double,
                  salt: String = "mix"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    df.withColumn("__keep", hashUniform(col(idCol), salt) < rate)
  }

  /** Per-source audit of a [[weightedMix]] pass: totals, kept counts, and
    * the realized rate (one aggregation over the mixed frame). */
  def mixAudit(mixed: DataFrame, sourceCol: String): DataFrame =
    mixed.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"))
      .select(col(sourceCol), col("n_total"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_total").cast("double"))
          .as("realized_rate"))

  /**
   * Exact corpus-wide heavy hitters: top-k most frequent values of `expr`
   * with counts. GroupBy + TakeOrderedAndProject: the count is map-side
   * combined, and the top-k never sorts the full distinct set. For
   * cardinalities where even the distinct set is too large, the documented
   * scale path is count-min over a sample; this exact form is the oracle.
   */
  def heavyHitters(df: DataFrame, value: Column, k: Int): DataFrame =
    df.select(value.as("value"))
      .groupBy(col("value")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value"))
      .limit(k)

  /**
   * Quantile binning (curriculum/quality tiers): ntile over a total order.
   * The ORDER BY includes the id as tiebreak so bin assignment is
   * deterministic — ntile over a non-total order would hash-differ run to
   * run. Single window over one range shuffle; at 100 TB prefer binning by
   * pre-computed approx quantile cutpoints (one pass + a broadcast) — this
   * exact form is the semantics pin and the oracle.
   */
  def quantileBins(df: DataFrame, idCol: String, score: Column, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(score.asc, col(idCol).asc)
    df.withColumn("bin", ntile(n).over(w))
  }
}
