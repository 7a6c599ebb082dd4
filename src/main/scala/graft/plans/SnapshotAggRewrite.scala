package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.store.Snapshots

/**
 * Opt-in Catalyst rule (`spark.graft.snapshots.agg.enabled=true`) that
 * answers global aggregates over a snapshot scan FROM METADATA — the
 * aggregate-pushdown twin of Iceberg's `SupportsPushDownAggregates` and
 * Delta's `OptimizeMetadataOnlyDeltaQuery`, for the dashboard queries
 * that dominate interactive load on a 100 TB table:
 *
 *  - `COUNT(*)` / `COUNT(lit)` (optionally under a WHERE) → the
 *    [[Snapshots.countWhere]] hybrid: rows proven by manifest bounds /
 *    null-counts / blooms count from metadata, only boundary files scan —
 *    and a plain `COUNT(*)` is [[Snapshots.metaCount]], zero IO.
 *  - `COUNT(col)` → the same, with an `IS NOT NULL` conjunct (the
 *    manifest's per-file null counts make whole files provable).
 *  - un-filtered `MIN(col)` / `MAX(col)` → [[Snapshots.metaBoundsOf]]
 *    (manifest key stats or stats sidecars), zero records read.
 *  - `MIN(col)` / `MAX(col)` under a WHERE → the
 *    [[Snapshots.metaBoundsWhere]] hybrid (round-17): files the
 *    predicate provably excludes contribute nothing, files provably
 *    fully inside contribute their recorded bounds unopened, boundary
 *    files scan with the residual — `SELECT max(ts) WHERE date =
 *    yesterday` on a clustered 100 TB table opens one or two files.
 *  - `SUM(col)` / `AVG(col)` over integral/decimal columns →
 *    [[Snapshots.metaSumOf]] (exact per-file `.sums` sidecars folded in
 *    decimal, hybrid-scanning uncovered files), and under a WHERE the
 *    [[Snapshots.metaSumWhere]] hybrid (round-17: proven-inside files
 *    contribute their sidecar sums unopened, boundary files scan with
 *    the residual) — with the overflow and FP-exactness side conditions
 *    proven before rewriting (see the match arms), because this rule
 *    never trades exactness.
 *
 * An attribute-only `GROUP BY` (one or more columns) gets the grouped
 * twin (round-17, [[rewriteGrouped]]): per-file bounds with min == max
 * on EVERY key prove a file single-group, so a rollup on the table's
 * cluster key(s) folds from metadata with one boundary scan — see
 * [[Snapshots.metaGroupAgg]]. `SELECT DISTINCT k...` is the degenerate
 * case (a grouped plan with no aggregates), and a global
 * `COUNT(DISTINCT k)` answers as the fold's cardinality.
 *
 * The global match is `Aggregate` with NO grouping, over at most one
 * `Filter`, over attribute-only `Project`s, over a parquet scan whose
 * file set is EXACTLY a committed version's data files
 * ([[Snapshots.plannerResolveVersion]] — memoized, verified, and
 * declining whenever MoR deletes or schema ops pend). Every aggregate in
 * the list must be answerable or the whole node is left untouched —
 * results are bit-identical to the unrewritten plan by construction
 * (countWhere/metaBoundsOf are exact, never estimates; pinned in
 * SnapshotAggRewriteSpec). The rewrite substitutes a one-row
 * [[LocalRelation]] carrying the Aggregate's own output attributes, so
 * parent operators resolve unchanged.
 *
 * Runs BEFORE [[SnapshotPruneRewrite]] in the injected order — once the
 * prune rule swaps a file index the set no longer matches a committed
 * version and this rule would decline.
 */
case class SnapshotAggRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  import SnapshotAggRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.getOption(EnabledKey).exists(_.toBoolean)) return plan
    // re-entrancy guard: countWhere's own boundary/full scans are counts
    // over (subsets of) the same version — optimizing THEM must not
    // re-enter this rule (an all-boundary split would recurse forever)
    if (inRewrite.get()) return plan
    plan.transformDown {
      case agg: Aggregate if agg.groupingExpressions.isEmpty =>
        rewrite(agg).getOrElse(agg)
      case agg: Aggregate if agg.groupingExpressions
          .forall(_.isInstanceOf[AttributeReference]) =>
        rewriteGrouped(agg).getOrElse(agg)
    }
  }

  /** Strip attribute-only Projects and at most one Filter down to the
    * relation; anything else declines. */
  private def unwrap(p: LogicalPlan, cond: Option[Expression])
      : Option[(Option[Expression], LogicalRelation)] = p match {
    case l: LogicalRelation => Some((cond, l))
    case Project(ps, ch) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(ch, cond)
    case Filter(c, ch) if cond.isEmpty && c.deterministic &&
        !SubqueryExpression.hasSubquery(c) => // a rand() filter must run as written
      unwrap(ch, Some(c))
    case _ => None
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = try {
    inRewrite.set(true)
    val (cond, rel) = unwrap(agg.child, None).getOrElse(return None)
    val (base, files, _) =
      SnapshotPruneRewrite.recognizeScan(rel).getOrElse(return None)
    val v = Snapshots.plannerResolveVersion(spark, base, files)
      .getOrElse(return None)
    // all-or-nothing: every aggregate expression must be answerable
    lazy val bounds = scala.collection.mutable.Map.empty[String, Option[(Any, Any)]]
    def boundsOf(a: AttributeReference): Option[(Any, Any)] =
      bounds.getOrElseUpdate(a.name,
        Snapshots.metaBoundsOf(spark, base, a.name, Some(v)).flatMap {
          case (mn, mx) => for {
            lo <- fromCanon(mn, a.dataType); hi <- fromCanon(mx, a.dataType)
          } yield (lo, hi)
        })
    def countOf(extra: Option[Expression]): Option[Long] = {
      val full = (cond, extra) match {
        case (Some(c), Some(e)) =>
          Some(org.apache.spark.sql.catalyst.expressions.And(c, e))
        case (c, e) => c.orElse(e)
      }
      full match {
        case None => Snapshots.metaCount(spark, base, Some(v))
        case Some(c) => Some(Snapshots.countWhere(spark, base, toColumn(c), Some(v)))
      }
    }
    // un-filtered: the metaSumOf sidecar fold; under a WHERE: the
    // metaSumWhere hybrid (round-17 — proven-inside files contribute
    // their sidecar sums unopened, boundary files scan with the
    // residual). The overflow proofs below cover both: the filtered
    // total's partials are sums over SUBSETS of the same rows.
    lazy val sums = scala.collection.mutable.Map
      .empty[String, Option[(java.math.BigDecimal, Long)]]
    def sumOf(a: AttributeReference): Option[(java.math.BigDecimal, Long)] =
      sums.getOrElseUpdate(a.name, cond match {
        case None => Snapshots.metaSumOf(spark, base, a.name, Some(v))
        case Some(c) =>
          Snapshots.metaSumWhere(spark, base, a.name, toColumn(c), Some(v))
      })
    // signed-sum admission: the metadata |partial-sum| bound (see the
    // Sum arm); memoized per column like the other metadata lookups
    lazy val absBounds = scala.collection.mutable.Map
      .empty[String, Option[java.math.BigDecimal]]
    def absBoundOf(a: AttributeReference): Option[java.math.BigDecimal] =
      absBounds.getOrElseUpdate(a.name,
        Snapshots.metaAbsSumBound(spark, base, a.name, Some(v)))
    // filtered MIN/MAX: the metaBoundsWhere hybrid (prove files fully
    // inside the WHERE from stats, scan only boundary files). Outer None
    // = decline; inner None = no matching rows (the aggregate is NULL).
    lazy val wheres = scala.collection.mutable.Map
      .empty[String, Option[Option[(Any, Any)]]]
    def boundsWhereOf(a: AttributeReference): Option[Option[(Any, Any)]] =
      wheres.getOrElseUpdate(a.name,
        Snapshots.metaBoundsWhere(spark, base, a.name,
            toColumn(cond.get), Some(v)) match {
          case None => None
          case Some(None) => Some(None)
          case Some(Some((mn, mx))) =>
            (for {
              lo <- fromCanon(mn, a.dataType)
              hi <- fromCanon(mx, a.dataType)
            } yield (lo, hi)) match {
              case Some(p) => Some(Some(p)) // parsed: answer exactly
              case None => None // unparseable canon: decline, never guess
            }
        })
    // COUNT(DISTINCT k): the group fold's cardinality (round-17) — exact
    // because metaGroupAgg merges proven single-group files with the
    // grouped boundary scan, so co-occurring values never double-count;
    // the NULL group is excluded (COUNT DISTINCT ignores NULLs). Only
    // answerable when the column is clustered enough for the fold.
    lazy val dcounts = scala.collection.mutable.Map.empty[String, Option[Long]]
    def distinctCountOf(a: AttributeReference): Option[Long] =
      dcounts.getOrElseUpdate(a.name, {
        val maxGroups = spark.conf.getOption(MaxGroupsKey)
          .map(_.toInt).getOrElse(10000)
        Snapshots.metaGroupAgg(spark, base, Seq(a.name), Nil, Nil, Nil,
            Some(v), maxGroups, cond.map(toColumn))
          .map(_.count(_.key.head.isDefined).toLong)
      })
    val values: Seq[Any] = agg.aggregateExpressions.map {
      case Alias(AggregateExpression(
          Count(Seq(a: AttributeReference)), _, true, None, _), _) =>
        distinctCountOf(a).getOrElse(return None)
      case Alias(AggregateExpression(fn, _, false, None, _), _) => fn match {
        case Count(Seq(l: Literal)) if l.value != null =>
          countOf(None).getOrElse(return None)
        case Count(Seq(a: AttributeReference)) =>
          countOf(Some(
            org.apache.spark.sql.catalyst.expressions.IsNotNull(a)))
            .getOrElse(return None)
        case Min(a: AttributeReference) =>
          if (cond.isEmpty) boundsOf(a).getOrElse(return None)._1
          else boundsWhereOf(a).getOrElse(return None).map(_._1).orNull
        case Max(a: AttributeReference) =>
          if (cond.isEmpty) boundsOf(a).getOrElse(return None)._2
          else boundsWhereOf(a).getOrElse(return None).map(_._2).orNull
        // SUM from the exact sidecar fold — with an exactness proof that
        // holds in EVERY eval mode, by either of two routes:
        //  (a) non-negativity (metadata min ≥ 0): partial sums are
        //      monotone and bounded by the total, so if the total fits
        //      the output type no partial can overflow;
        //  (b) the signed bound (round-17, [[Snapshots.metaAbsSumBound]]):
        //      Σᵢ rowsᵢ·max(|loᵢ|,|hiᵢ|) bounds |any partial sum| under
        //      any regrouping, so if THAT fits the accumulator type no
        //      partial can overflow either — admitting columns that have
        //      held negatives (account deltas, log-ratios).
        // Either way: LEGACY can't wrap, ANSI can't throw, TRY can't
        // null, and any regrouping reproduces the total.
        case s @ Sum(a: AttributeReference, _) =>
          val (total, n) = sumOf(a).getOrElse(return None)
          if (n == 0L) null
          else s.dataType match {
            case LongType =>
              val fits = (b: java.math.BigDecimal) =>
                b.compareTo(java.math.BigDecimal.valueOf(Long.MaxValue)) <= 0
              if (!provenNonNegative(boundsOf(a)) &&
                  !absBoundOf(a).exists(fits)) return None
              scala.util.Try(total.longValueExact()).getOrElse(return None)
            case d: DecimalType =>
              val dec = Decimal(total)
              if (!dec.changePrecision(d.precision, d.scale)) return None
              val fits = (b: java.math.BigDecimal) => {
                val bd = Decimal(b); bd.changePrecision(d.precision, d.scale)
              }
              if (!provenNonNegative(boundsOf(a)) &&
                  !absBoundOf(a).exists(fits)) return None
              dec
            case _ => return None
          }
        // AVG over integrals: Spark accumulates the sum in DOUBLE, which
        // is exact only while no partial sum can leave ±2^53 — proven by
        // non-negativity + total ≤ 2^53, or by the signed |partial|
        // bound ≤ 2^53. Otherwise decline rather than differ in the
        // last bits.
        case av @ Average(a: AttributeReference, _)
            if av.dataType == DoubleType =>
          val (total, n) = sumOf(a).getOrElse(return None)
          if (n == 0L) null
          else {
            val lim = java.math.BigDecimal.valueOf(1L << 53)
            val ok = (provenNonNegative(boundsOf(a)) &&
                total.compareTo(lim) <= 0) ||
              absBoundOf(a).exists(_.compareTo(lim) <= 0)
            if (!ok) return None
            total.doubleValue() / n
          }
        case _ => return None
      }
      case _ => return None
    }
    Some(LocalRelation(agg.output.map(_.asInstanceOf[Attribute]),
      Seq(InternalRow.fromSeq(values))))
  } catch {
    // decline on ANY resolution hiccup: the aggregate runs unrewritten
    case scala.util.control.NonFatal(_) => None
  } finally inRewrite.set(false)

  /** GROUP BY <attributes> over a snapshot scan, optionally under
    * one WHERE → [[Snapshots.metaGroupAgg]] (round-17): per-file bounds
    * with min == max and zero nulls on EVERY key prove a file single-group, so the
    * rollup folds from manifests/sidecars with ONE boundary scan for the
    * files straddling group borders (a WHERE additionally prunes files
    * and demands full-inclusion proof before a file may fold) — the
    * ad-hoc per-day/per-source dashboard rollup a clustered table
    * answers almost for free. Supported aggregates per group: the key
    * itself, COUNT(*)/COUNT(lit), COUNT(col), SUM(col)
    * (integral/decimal, under the same overflow-exactness proofs as the
    * global arm — non-negativity or the |partial-sum| bound, which cover
    * every subgroup), MIN/MAX(col). Anything else, or more than the
    * `maxGroups` cap, declines — the fold is driver-side and must stay
    * dashboard-sized. */
  private def rewriteGrouped(agg: Aggregate): Option[LogicalPlan] = try {
    inRewrite.set(true)
    val keys = agg.groupingExpressions.map(_.asInstanceOf[AttributeReference])
    val (cond, rel) = unwrap(agg.child, None).getOrElse(return None)
    val (base, files, _) =
      SnapshotPruneRewrite.recognizeScan(rel).getOrElse(return None)
    val v = Snapshots.plannerResolveVersion(spark, base, files)
      .getOrElse(return None)
    // classify every output expression; collect the evidence columns
    sealed trait Out
    final case class KeyOut(i: Int) extends Out
    case object RowsOut extends Out
    final case class CntOut(c: String) extends Out
    final case class SumOut(c: String, fn: Sum) extends Out
    final case class MinOut(c: String, dt: DataType) extends Out
    final case class MaxOut(c: String, dt: DataType) extends Out
    def keyIdx(a: AttributeReference): Option[Int] = {
      val i = keys.indexWhere(_.semanticEquals(a)); if (i >= 0) Some(i) else None
    }
    val outs: Seq[Out] = agg.aggregateExpressions.map {
      case a: AttributeReference if keyIdx(a).isDefined => KeyOut(keyIdx(a).get)
      case Alias(a: AttributeReference, _) if keyIdx(a).isDefined =>
        KeyOut(keyIdx(a).get)
      case Alias(AggregateExpression(fn, _, false, None, _), _) => fn match {
        case Count(Seq(l: Literal)) if l.value != null => RowsOut
        case Count(Seq(a: AttributeReference)) => CntOut(a.name)
        case s @ Sum(a: AttributeReference, _) => SumOut(a.name, s)
        case Min(a: AttributeReference) => MinOut(a.name, a.dataType)
        case Max(a: AttributeReference) => MaxOut(a.name, a.dataType)
        case _ => return None
      }
      case _ => return None
    }
    val cntCols = outs.collect { case CntOut(c) => c }.distinct
    val sumOuts = outs.collect { case s: SumOut => s }
    val sumCols = sumOuts.map(_.c).distinct
    val mmCols = outs.collect {
      case MinOut(c, _) => c
      case MaxOut(c, _) => c
    }.distinct
    val maxGroups = spark.conf.getOption(MaxGroupsKey)
      .map(_.toInt).getOrElse(10000)
    val groups = Snapshots.metaGroupAgg(spark, base, keys.map(_.name),
      cntCols, sumCols, mmCols, Some(v), maxGroups, cond.map(toColumn))
      .getOrElse(return None)
    // SUM overflow proofs hold group-wise: non-negativity bounds every
    // group's partials by its own total (each checked on conversion),
    // the signed |partial-sum| bound covers every subgroup outright
    lazy val bounds = scala.collection.mutable.Map.empty[String, Option[(Any, Any)]]
    def boundsOf(a: String, dt: DataType): Option[(Any, Any)] =
      bounds.getOrElseUpdate(a,
        Snapshots.metaBoundsOf(spark, base, a, Some(v)).flatMap {
          case (mn, mx) => for {
            lo <- fromCanon(mn, dt); hi <- fromCanon(mx, dt)
          } yield (lo, hi)
        })
    lazy val absBounds = scala.collection.mutable.Map
      .empty[String, Option[java.math.BigDecimal]]
    def absBoundOf(a: String): Option[java.math.BigDecimal] =
      absBounds.getOrElseUpdate(a,
        Snapshots.metaAbsSumBound(spark, base, a, Some(v)))
    def sumProven(s: SumOut): Boolean = s.fn.child.dataType match {
      case dt if provenNonNegative(boundsOf(s.c, dt)) => true
      case _ => s.fn.dataType match {
        case LongType => absBoundOf(s.c).exists(
          _.compareTo(java.math.BigDecimal.valueOf(Long.MaxValue)) <= 0)
        case d: DecimalType => absBoundOf(s.c).exists { b =>
          val bd = Decimal(b); bd.changePrecision(d.precision, d.scale)
        }
        case _ => false
      }
    }
    if (sumOuts.nonEmpty && !sumOuts.forall(sumProven)) return None
    val rows = groups.map { g =>
      InternalRow.fromSeq(outs.map {
        case KeyOut(i) => g.key(i).flatMap(fromCanon(_, keys(i).dataType)).orNull
        case RowsOut => g.rows
        case CntOut(c) => g.cnt(c)
        case SumOut(c, fn) =>
          val (total, n) = g.sum(c)
          if (n == 0L) null
          else fn.dataType match {
            case LongType =>
              scala.util.Try(total.longValueExact()).getOrElse(return None)
            case d: DecimalType =>
              val dec = Decimal(total)
              if (dec.changePrecision(d.precision, d.scale)) dec
              else return None
            case _ => return None
          }
        case MinOut(c, dt) => g.mn.get(c).flatMap(fromCanon(_, dt)).orNull
        case MaxOut(c, dt) => g.mx.get(c).flatMap(fromCanon(_, dt)).orNull
      })
    }
    // a NULL key value that fromCanon could not parse back must decline,
    // not silently null a real group key
    if (groups.exists(g => keys.indices.exists(i => g.key(i).isDefined &&
        fromCanon(g.key(i).get, keys(i).dataType).isEmpty))) return None
    Some(LocalRelation(agg.output.map(_.asInstanceOf[Attribute]), rows))
  } catch {
    case scala.util.control.NonFatal(_) => None
  } finally inRewrite.set(false)

  /** Resolved condition → Column usable against a fresh read: attributes
    * unresolve by name (the countWhere frame re-resolves them). */
  private def toColumn(cond: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.Shims.column(cond.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
}

object SnapshotAggRewrite {
  val EnabledKey = "spark.graft.snapshots.agg.enabled"
  /** Grouped-pushdown group cap: the per-group fold is driver-side, so a
    * rollup may rewrite only while its group count stays dashboard-sized
    * (a GROUP BY user_id with millions of groups runs as written). */
  val MaxGroupsKey = "spark.graft.snapshots.agg.maxGroups"

  private val inRewrite = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  /** Does the metadata min-bound prove the column non-negative? */
  private[plans] def provenNonNegative(bounds: Option[(Any, Any)]): Boolean =
    bounds.exists {
      case (lo: Long, _) => lo >= 0L
      case (lo: Int, _) => lo >= 0
      case (lo: Short, _) => lo >= 0
      case (lo: Byte, _) => lo >= 0
      case (lo: Decimal, _) => lo.toBigDecimal.signum >= 0
      case _ => false
    }

  /** Parse a stats-canon bound string back into the column's CATALYST
    * value (the inverse of statExtract's canon: plain string for
    * numerics/strings, epoch micros for timestamps, epoch days for
    * dates). None = unsupported type or unparseable → decline. */
  private[plans] def fromCanon(s: String, dt: DataType): Option[Any] =
    scala.util.Try[Any] {
      dt match {
        case LongType => s.toLong
        case IntegerType => s.toInt
        case ShortType => s.toShort
        case ByteType => s.toByte
        case DoubleType => s.toDouble
        case FloatType => s.toFloat
        case StringType => UTF8String.fromString(s)
        case TimestampType => s.toLong // canon: epoch micros
        case DateType => s.toInt // canon: epoch days
        case d: DecimalType =>
          val dec = Decimal(new java.math.BigDecimal(s))
          if (dec.changePrecision(d.precision, d.scale)) dec
          else throw new IllegalArgumentException(s"decimal overflow: $s")
        case _ => throw new IllegalArgumentException(s"no canon for $dt")
      }
    }.toOption
}
