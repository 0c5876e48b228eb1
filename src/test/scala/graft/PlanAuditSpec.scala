package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The SCALE.md §4 whitelist as an executable regression: every catalog
  * query's physical plan must be free of non-equi joins
  * (BroadcastNestedLoopJoin / CartesianProduct) unless the query is in the
  * documented intentional set — broadcast-scalar attachments, sketch-sized
  * cross joins, k-row centroid quantizers, and the declared all-pairs
  * baselines. A new operator that accidentally plans a cross join fails
  * here instead of surviving until a human reads the PlanAudit dump.
  *
  * Plans are built at sf0.001 — join SELECTION depends only on statistics
  * and hints, not row counts at this scale, and the initial (pre-AQE)
  * physical plan is exactly what PlanAudit inspects.
  */
class PlanAuditSpec extends SparkTestBase {

  /** Must match SCALE.md §4 — change BOTH or neither. */
  private val nestedLoopWhitelist = Set(
    "q_ann_cosine", "q_ann_topk",        // broadcast(seed queries) ⨝ corpus
    "q_ann_quantized",                   // same shape, int8-quantized vectors
    "q_dedup_embedding",                 // declared all-pairs baseline
    "q_ann_ivf", "q_ann_ivf_probe", "q_ann_ivf_trained", // k-row centroid cross join
    "q_ann_pq", "q_ann_pq_trained",      // broadcast(seed queries) ⨝ code scan (ADC)
    "q_hybrid_rrf",                      // dense arm = broadcast(seeds) ⨝ corpus (q_ann_cosine shape)
    "q_ann_ivfpq",                       // k-row centroid cross join; search is cell-equi
    "q_tfidf_top_terms", "q_bm25_top_terms", "q_token_rarity",
    "q_window_anomaly",                  // 1-row stats broadcast
    "q_assoc_rules",                     // 1-row basket-total broadcast
    "q_sketch_hist_quantile",
    "q_hist_quantile_by_source",
    "q_winsorize_stats",                 // quantile list × bin-sized sketch
    "q_bloom_join",                      // 1-row packed-bitmap broadcast
    "q_mix_temperature",                 // 1-row Σ√cnt total broadcast
    "q_graph_modularity",                // 1-row edge-count m broadcast
    "q_bpe_merge")                       // 1-row argmax-pair broadcast

  private def collectAll(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children ++ p.subqueries).flatMap {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case c => collectAll(c)
    }

  test("no catalog query plans a non-whitelisted nested-loop or cartesian join") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).isDirectory)
    val offenders = scala.collection.mutable.Map.empty[String, Seq[String]]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan
      val joins = collectAll(plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).map(_.nodeName).filter(n => n.contains("NestedLoop") || n.contains("Cartesian"))
      if (joins.nonEmpty && !nestedLoopWhitelist.contains(name))
        offenders += name -> joins
    }
    assert(offenders.isEmpty,
      s"non-equi joins outside the SCALE.md §4 whitelist: $offenders")
  }
}
