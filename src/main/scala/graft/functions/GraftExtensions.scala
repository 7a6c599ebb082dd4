package graft.functions

import org.apache.spark.sql.SparkSessionExtensions

/**
 * Idiomatic integration point: register the engine's native expressions at
 * session build time via
 * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")` —
 * the same mechanism Delta/Iceberg/Sedona use. Equivalent to calling
 * `GraftFunctions.register(spark)` post-hoc; both route through the same
 * function descriptions.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(ext.injectFunction)
    // opt-in ANN top-k rewrite (spark.graft.ann.enabled=true)
    ext.injectOptimizerRule(session => graft.plans.AnnRewrite(session))
    // opt-in metadata-answered aggregates — MUST precede the prune rule:
    // a pruned file index no longer matches a committed version
    // (spark.graft.snapshots.agg.enabled=true)
    ext.injectOptimizerRule(session => graft.plans.SnapshotAggRewrite(session))
    // opt-in manifest file pruning for plain reads
    // (spark.graft.snapshots.prune.enabled=true)
    ext.injectOptimizerRule(session => graft.plans.SnapshotPruneRewrite(session))
  }
}
