package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-governance operators for training corpora: PII redaction beyond the
 * email/URL scrub in [[TextAnalysis]], a one-pass PII profile, and keyed
 * deterministic pseudonymization.
 *
 * All patterns stay in the RE2-safe regex subset (no backreferences, no
 * lookaround) so the same pattern runs identically in Spark
 * (java.util.regex) and DuckDB (RE2) — which is what makes the hash oracles
 * possible. Everything is a scalar projection: redaction and
 * pseudonymization ride the scan with zero shuffles and compose with
 * partition pruning, exactly like `Curation.weightedMix`.
 */
object Governance {

  // Order matters in the chain: cards before IPs before phones — the
  // looser phone pattern would otherwise swallow dotted IPs and spaced
  // card runs.
  private[text] val CardRe = "\\b(?:\\d[ -]?){12,15}\\d\\b"
  private[text] val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private[text] val PhoneRe = "\\+?\\d[\\d().\\s-]{6,}\\d"

  /** Replace 13–16 digit card-like runs (optional space/dash separators). */
  def redactCardLike(text: Column, token: String = "[CARD]"): Column =
    regexp_replace(text, CardRe, token)

  /** Replace dotted-quad IPv4 literals. */
  def redactIpv4(text: Column, token: String = "[IP]"): Column =
    regexp_replace(text, Ipv4Re, token)

  /** Replace phone-like digit runs (8+ chars of digits/().-/space). */
  def redactPhones(text: Column, token: String = "[PHONE]"): Column =
    regexp_replace(text, PhoneRe, token)

  /** The full PII chain: cards → IPs → phones → emails → URLs. */
  def redactPii(text: Column): Column =
    TextAnalysis.redactUrls(TextAnalysis.redactEmails(
      redactPhones(redactIpv4(redactCardLike(text)))))

  /**
   * Per-row PII hit counts, one projection (no shuffle): how much of each
   * class a document leaks. Counts follow the CHAIN's priority — each class
   * is counted on text with the higher-priority classes already redacted
   * (the loose phone pattern would otherwise also count every card run and
   * IP), so each count equals the number of tokens [[redactPii]] inserts
   * for that class. Feed to quarantine gates ("drop any doc with a card
   * number") or corpus-level rollups.
   */
  def piiProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null text profiles as zero hits, not a null row (a quarantine gate
    // reading `n_cards > 0` must not three-value-logic its way past a null)
    val t = coalesce(col(textCol), lit(""))
    val afterCards = redactCardLike(t)
    val afterIps = redactIpv4(afterCards)
    df.select(col(idCol),
      regexp_count(t, lit(CardRe)).as("n_cards"),
      regexp_count(afterCards, lit(Ipv4Re)).as("n_ips"),
      regexp_count(afterIps, lit(PhoneRe)).as("n_phones"),
      regexp_count(t,
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")).as("n_emails"),
      regexp_count(t, lit("https?://[^\\s]+")).as("n_urls"))
  }

  /**
   * Keyed deterministic pseudonymization: value → first 16 hex chars of
   * md5(key|value). The same (key, value) always maps to the same token, so
   * joins and group-bys survive anonymization (referential integrity), while
   * reversing requires the key and a dictionary attack. Portable: DuckDB
   * computes the identical token (`substr(md5(key || '|' || v), 1, 16)`),
   * which is also the oracle. Rotate `key` to unlink releases.
   */
  def pseudonymize(value: Column, key: String): Column =
    when(value.isNull, lit(null))
      .otherwise(substring(md5(concat(lit(key + "|"), value.cast("string"))), 1, 16))

  /**
   * k-anonymity audit: every quasi-identifier combination with fewer than
   * `k` rows is re-identifiable and flagged. One hash aggregate with
   * map-side partials — the group count is the whole computation, so this
   * runs at corpus scale as a single shuffle on the quasi-id tuple.
   * Output: (quasiIds..., n_rows, at_risk).
   */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    require(quasiIds.nonEmpty && k >= 2, s"need quasi-ids and k >= 2, got $quasiIds, k=$k")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("at_risk", col("n_rows") < k)
  }

  /**
   * Suppression to enforce k-anonymity: drop every row whose quasi-id
   * combination has fewer than `k` occurrences (the simplest of the
   * generalize/suppress repertoire — generalization, e.g. bucketing an
   * age into a band, belongs UPSTREAM in the projection that defines the
   * quasi-ids). Planned as aggregate + semi-join on the quasi-id tuple;
   * both sides cluster on the same keys, so AQE keeps it one logical
   * shuffle of the table.
   */
  def suppressBelowK(df: DataFrame, quasiIds: Seq[String], k: Int): DataFrame = {
    val safe = kAnonymity(df, quasiIds, k).filter(!col("at_risk"))
      .select(quasiIds.map(col): _*)
    df.join(safe, quasiIds, "left_semi")
  }

  // ── ε-differential-privacy release (Laplace mechanism) ─────────────────

  /** Laplace(scale) noise from a portable uniform via the inverse CDF:
    * x = −b·sign(u−0.5)·ln(1−2|u−0.5|). The uniform sits on
    * [[graft.ops.Curation.hashUniform]]'s 1e-4 grid; the +5e-5 nudge
    * centers each grid cell so neither endpoint reaches ln(0). Pure
    * double arithmetic — DuckDB replays it bit-for-bit. */
  private def laplaceNoise(u: Column, scale: Double): Column = {
    val v = u + lit(0.00005)
    -lit(scale) * signum(v - lit(0.5)) * log(lit(1.0) - lit(2.0) * abs(v - lit(0.5)))
  }

  /**
   * ε-DP group counts (Dwork et al., "Calibrating Noise to Sensitivity",
   * TCC 2006): noisy_n = n + Lap(1/ε) — a count query has sensitivity 1.
   * The noise draw is DETERMINISTIC per (salt, group) via the portable
   * hash-uniform: re-running the release on the same data reproduces the
   * same noise instead of leaking a fresh draw (the repeated-release
   * caveat of practical DP — the privacy budget is spent ONCE per salt,
   * and a pipeline rerun is not a new query). Plan: one grouped count;
   * the noise is a scalar projection on the aggregate's output — no
   * extra pass, no extra shuffle, so the release runs at 100 TB exactly
   * like the underlying count.
   */
  def dpCounts(df: DataFrame, groupCol: String, epsilon: Double,
               salt: String = "dp"): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol), col("n"),
        round(col("n") + laplaceNoise(
          graft.ops.Curation.hashUniform(col(groupCol), salt),
          1.0 / epsilon), 6).as("noisy_n"))
  }

  /**
   * ε-DP group sums: values are CLIPPED to [0, clip] first (bounding each
   * row's contribution is what gives the query finite sensitivity), then
   * noisy_sum = Σ clip(v) + Lap(clip/ε). Same deterministic-noise and
   * one-pass plan properties as [[dpCounts]]; the clip is a scalar on the
   * scan, so nulls drop out of the sum exactly as in the plain aggregate.
   */
  def dpSum(df: DataFrame, groupCol: String, valueCol: String, clip: Double,
            epsilon: Double, salt: String = "dpsum"): DataFrame = {
    require(epsilon > 0 && clip > 0,
      s"epsilon and clip must be positive, got eps=$epsilon clip=$clip")
    df.groupBy(col(groupCol))
      .agg(sum(least(greatest(col(valueCol), lit(0.0)), lit(clip)))
        .as("__cs"))
      .select(col(groupCol), round(col("__cs"), 6).as("clipped_sum"),
        round(col("__cs") + laplaceNoise(
          graft.ops.Curation.hashUniform(col(groupCol), salt),
          clip / epsilon), 6).as("noisy_sum"))
  }
}
