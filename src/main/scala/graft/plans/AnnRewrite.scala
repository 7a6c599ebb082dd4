package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType}

import graft.expr.CosineSimilarity
import graft.rag.Rag

/**
 * Opt-in ANN optimizer rule (SURVEY §4 stretch; preference (c) in the
 * build brief): rewrites a brute-force cosine top-k
 *
 *   Sort(score DESC, …)
 *     Project(…, score := cosine_sim(vecCol, <literal query vector>))
 *       <child whose output carries a materialized `sig` column>
 *
 * into the LSH-prefiltered form
 *
 *   Sort(score DESC, …)
 *     Project(…)
 *       Filter(bit_count(sig ^ <query signature>) <= maxHamming)
 *         <child>
 *
 * The query signature is computed at plan time from the literal vector and
 * the session-configured hyperplane family (seed/bits), the same family
 * used to materialize `sig` at write time (Rag.withSignature). On a table
 * partitioned/z-ordered by `sig` the injected filter prunes files before
 * the expensive cosine projection runs.
 *
 * APPROXIMATE BY DESIGN: candidates outside Hamming range are dropped, so
 * the rule only fires when `spark.graft.ann.enabled=true` — turning it on
 * is the explicit opt-in to approximate top-k (exactly like choosing
 * `annKnn` over `knn` in the DataFrame API; RagSpec pins their agreement).
 *
 * THE IVF PATH (round-10): the same top-k shape over a table carrying a
 * materialized `cell` column (Ivf.withCell at write time) is rewritten to
 *
 *   Sort(score DESC, …)
 *     Project(…)
 *       Filter(cell IN (<nProbe nearest cells to the query>))
 *         <child>
 *
 * — the probe prune of Ivf.ivfKnn, derived automatically. The probe set is
 * computed at plan time from the coarse quantizer, resolved in preference
 * order: the session-registered model ([[AnnRewrite.registerIvf]]) first,
 * else the PATH-CONVENTION sidecar (round-11): the scan's root path is
 * checked for `_graft_ivf/centroids.txt` ([[graft.rag.Ivf.saveModel]],
 * written when the cell column is materialized) — the miniature of the
 * index-metadata catalog a real lakehouse keeps per table, and the form
 * that needs ZERO caller code at query time. On a table partitioned by
 * `cell` the IN-filter is partition pruning: the scan touches
 * nProbe/nCells of the files. When a table carries BOTH `sig` and `cell`,
 * the Hamming prefilter wins (documented preference: it composes with
 * z-order on sig and needs no registered model).
 *
 * Registered via GraftExtensions.injectOptimizerRule — runs in the
 * user-provided-optimizer batch, after constant folding (so the cast query
 * vector has already collapsed to a Literal).
 */
case class AnnRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  import AnnRewrite._

  private def conf(key: String, dflt: String): String =
    spark.conf.getOption(key).getOrElse(dflt)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf(EnabledKey, "false").toBoolean) return plan
    val bits = conf(BitsKey, "16").toInt
    val seed = conf(SeedKey, "42").toLong
    val maxHamming = conf(MaxHammingKey, "8").toInt
    val nProbe = conf(NProbeKey, "2").toInt

    plan.transformDown {
      case sort @ Sort(SortOrder(scoreRef: AttributeReference, Descending, _, _) +: _, true, child, _) =>
        val rewrittenChild = child.transformDown {
          case p @ Project(projList, pchild) =>
            val qvecOpt = projList.collectFirst {
              case Alias(CosineSimilarity(_, lit: Literal), _) =>
                literalVec(lit)
              case Alias(CosineSimilarity(lit: Literal, _), _) =>
                literalVec(lit)
            }.flatten
            val isScoreProj = projList.exists {
              case Alias(_: CosineSimilarity, name) => name == scoreRef.name
              case _ => false
            }
            val sigAttr = pchild.output.find(a => a.name == "sig" && a.dataType == LongType)
            val cellAttr = pchild.output.find(a => a.name == "cell" && a.dataType == IntegerType)
            (qvecOpt, sigAttr, cellAttr) match {
              case (Some(qvec), Some(sig), _) if isScoreProj =>
                val planes = Rag.hyperplanes(qvec.length, bits, seed)
                val qsig = planes.zipWithIndex.map { case (pl, i) =>
                  val dot = pl.zip(qvec).map { case (a, b) => a.toDouble * b.toDouble }.sum
                  if (dot >= 0) 1L << i else 0L
                }.sum
                val cond = LessThanOrEqual(
                  BitwiseCount(BitwiseXor(sig, Literal(qsig, LongType))),
                  Literal(maxHamming, IntegerType))
                Project(projList, Filter(cond, pchild))
              case (Some(qvec), None, Some(cell)) if isScoreProj =>
                // explicit session registration first; else the
                // path-convention sidecar (round-11): the scan's root path
                // names its quantizer, so plain orderBy(cos).limit(k) is
                // probe-pruned with zero caller code
                ivfModel(spark).orElse(pathIvfModel(spark, pchild)) match {
                  case Some(model) =>
                    val probes = model.probesFor(qvec, nProbe)
                    val cond = In(cell, probes.map(c => Literal(c, IntegerType)))
                    Project(projList, Filter(cond, pchild))
                  case None => p
                }
              case _ => p
            }
        }
        if (rewrittenChild fastEquals child) sort
        else sort.copy(child = rewrittenChild)
    }
  }

  private def literalVec(lit: Literal): Option[Array[Float]] = lit.dataType match {
    case ArrayType(FloatType, _) =>
      val ad = lit.value.asInstanceOf[ArrayData]
      Some(ad.toFloatArray())
    case _ => None
  }

  /** Path-convention lookup: find the subtree's file-source scan and read
    * its root path's `_graft_ivf` sidecar ([[graft.rag.Ivf.saveModel]]).
    * Memoized per path — the optimizer re-runs rules many times per query
    * and the lookup must not re-touch the filesystem each pass. */
  private def pathIvfModel(spark: SparkSession,
                           plan: LogicalPlan): Option[graft.rag.Ivf.Model] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val root = plan.collectFirst {
      case lr: LogicalRelation => lr.relation match {
        case fsRel: HadoopFsRelation =>
          fsRel.location.rootPaths.headOption.map(_.toString)
        case _ => None
      }
    }.flatten
    root.flatMap(p => AnnRewrite.cachedPathModel(spark, p))
  }
}

object AnnRewrite {
  val EnabledKey = "spark.graft.ann.enabled"
  val BitsKey = "spark.graft.ann.bits"
  val SeedKey = "spark.graft.ann.seed"
  val MaxHammingKey = "spark.graft.ann.maxHamming"
  /** Probe count for the IVF rewrite (Ivf.ivfKnn's nProbe). */
  val NProbeKey = "spark.graft.ann.ivf.nProbe"

  // Session-scoped IVF index metadata: the coarse quantizer a table's
  // `cell` column was materialized with. KiB-sized (K×dim floats) — the
  // in-process miniature of the per-table index catalog a real system
  // keeps. Sessions must unregister (or be short-lived): the map holds a
  // strong reference to the session key until then.
  private val ivfModels =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, graft.rag.Ivf.Model]()

  /** Register the session's IVF coarse quantizer so the rule can derive
    * probe sets for plain `orderBy(cosine).limit(k)` queries. */
  def registerIvf(spark: SparkSession, model: graft.rag.Ivf.Model): Unit =
    ivfModels.put(spark, model)

  def unregisterIvf(spark: SparkSession): Unit = ivfModels.remove(spark)

  private[plans] def ivfModel(spark: SparkSession): Option[graft.rag.Ivf.Model] =
    Option(ivfModels.get(spark))

  // Path-convention catalog cache (round-11): sidecar lookups memoize per
  // table root path, INCLUDING negative results — a sidecar written after
  // the path's first query in this JVM needs invalidatePathCache() (index
  // builds normally precede reads, so in practice this never fires).
  private val pathModels =
    new java.util.concurrent.ConcurrentHashMap[String, Option[graft.rag.Ivf.Model]]()

  private[plans] def cachedPathModel(spark: SparkSession,
                                     path: String): Option[graft.rag.Ivf.Model] = {
    val hit = pathModels.get(path)
    if (hit != null) hit
    else {
      // an ABSENT sidecar returns None from loadModel and is memoized (the
      // documented negative cache). A thrown error is a load FAILURE —
      // possibly transient IO — so it is NOT memoized (the next query
      // retries), and only NonFatal is swallowed: an OOM/interrupt must
      // propagate, not become a permanent "no index" answer (round-11
      // advisor item). Plain get/put instead of computeIfAbsent: a racing
      // duplicate load is harmless, a poisoned permanent entry is not.
      val loaded =
        try graft.rag.Ivf.loadModel(spark, path)
        catch { case scala.util.control.NonFatal(_) => return None }
      pathModels.put(path, loaded)
      loaded
    }
  }

  /** Drop memoized sidecar lookups (tests / post-hoc index builds). */
  def invalidatePathCache(): Unit = pathModels.clear()
}
