package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
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
 *
 * The match is `Aggregate` with NO grouping, over at most one `Filter`,
 * over attribute-only `Project`s, over a parquet scan whose file set is
 * EXACTLY a committed version's data files
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
    val values: Seq[Any] = agg.aggregateExpressions.map {
      case Alias(AggregateExpression(fn, _, false, None, _), _) => fn match {
        case Count(Seq(l: Literal)) if l.value != null =>
          countOf(None).getOrElse(return None)
        case Count(Seq(a: AttributeReference)) =>
          countOf(Some(
            org.apache.spark.sql.catalyst.expressions.IsNotNull(a)))
            .getOrElse(return None)
        case Min(a: AttributeReference) if cond.isEmpty =>
          boundsOf(a).getOrElse(return None)._1
        case Max(a: AttributeReference) if cond.isEmpty =>
          boundsOf(a).getOrElse(return None)._2
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

  /** Resolved condition → Column usable against a fresh read: attributes
    * unresolve by name (the countWhere frame re-resolves them). */
  private def toColumn(cond: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.Shims.column(cond.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
}

object SnapshotAggRewrite {
  val EnabledKey = "spark.graft.snapshots.agg.enabled"

  private val inRewrite = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
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
