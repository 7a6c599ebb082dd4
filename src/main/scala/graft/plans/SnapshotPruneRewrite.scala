package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

import graft.store.Snapshots

/**
 * Opt-in Catalyst rule (`spark.graft.snapshots.prune.enabled=true`) that
 * makes manifest file pruning AUTOMATIC for plain reads: a user who writes
 * `Snapshots.read(spark, base).filter(key === v)` — or hands that frame to
 * code that has never heard of this library — gets the same file skipping
 * `scanWhere` does explicitly. The rule recognizes a `Filter` directly
 * over a parquet `LogicalRelation` whose file set is EXACTLY a committed
 * graft version's data files (every path `<base>/v=N/<file>`), asks the
 * unified scan planner which files the predicate can touch, and swaps in a
 * pruned file index; the filter stays on top for residual evaluation, so
 * results are bit-identical (pinned in SnapshotPruneRewriteSpec).
 *
 * Declines conservatively — the scan proceeds untouched — whenever the
 * exact-version match fails: pending MoR deletes or schema ops (their read
 * plans put projections/joins between Filter and relation anyway), a
 * subquery in the condition, partitioned relations, or a file set the rule
 * already pruned (which is what terminates the optimizer's fixpoint). This
 * is the same opt-in `SparkSessionExtensions` shape as [[AnnRewrite]], and
 * the Spark-idiomatic way to retrofit storage-layer pruning: Delta and
 * Iceberg's `PrepareDeltaScan`/`V2ScanRelationPushDown` do exactly this
 * plan surgery inside their extensions.
 */
case class SnapshotPruneRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  import SnapshotPruneRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.getOption(EnabledKey).exists(_.toBoolean)) return plan
    plan.transformDown {
      case f @ Filter(cond, l: LogicalRelation) =>
        pruneScan(f, cond, l).getOrElse(f)
    }
  }

  private def pruneScan(f: Filter, cond: Expression,
                        l: LogicalRelation): Option[Filter] = try {
    if (SubqueryExpression.hasSubquery(cond)) return None
    val (base, files, fsr) =
      SnapshotPruneRewrite.recognizeScan(l).getOrElse(return None)
    val dtOf = (c: String) => l.schema.find(_.name == c).map(_.dataType)
    Snapshots.plannerPruneFiles(spark, base, files, cond, dtOf)
      .map { kept =>
        val idx = new InMemoryFileIndex(spark, kept.map(new Path(_)),
          Map.empty[String, String], Some(fsr.dataSchema))
        Filter(cond, l.copy(relation = fsr.copy(location = idx)(
          fsr.sparkSession)))
      }
  } catch {
    // decline on ANY resolution hiccup (vanished manifest, racing writer):
    // pruning is an optimization, never a correctness dependency
    case scala.util.control.NonFatal(_) => None
  }
}

object SnapshotPruneRewrite {
  val EnabledKey = "spark.graft.snapshots.prune.enabled"

  /** Recognize a parquet [[LogicalRelation]] whose file listing COULD be a
    * committed snapshot version's data files: unpartitioned parquet, every
    * root `<base>/v=N/<file>` under one common base. Returns the base, the
    * base-relative file names, and the relation — shared by the prune rule
    * and [[SnapshotAggRewrite]]; whether the set IS a committed version is
    * the (memoized, verified) [[Snapshots.plannerResolveVersion]] step. */
  private[plans] def recognizeScan(l: LogicalRelation)
      : Option[(String, Set[String], HadoopFsRelation)] = {
    val fsr = l.relation match {
      case h: HadoopFsRelation if h.partitionSchema.isEmpty &&
        h.fileFormat.toString.toLowerCase.contains("parquet") => h
      case _ => return None
    }
    val roots = fsr.location.rootPaths
    if (roots.isEmpty) return None
    val parsed: Seq[(Path, String)] = roots.map { p =>
      val vdir = p.getParent
      if (vdir == null || vdir.getParent == null ||
          !vdir.getName.matches("v=\\d+")) return None
      (vdir.getParent, s"${vdir.getName}/${p.getName}")
    }
    val base = parsed.head._1
    if (parsed.exists(_._1.toString != base.toString)) return None
    Some((base.toString, parsed.map(_._2).toSet, fsr))
  }
}
