package graft

import graft.sim.Similarity
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Broadcast-side boundedness sweep over the similarity/embedding family —
  * the guard for the scale-killer class PlanSpec's red-flag sweep cannot
  * see (VERDICT r8 #3): a corpus-sized BROADCAST build side plans as a
  * perfectly legitimate BroadcastHashJoin, returns correct rows (the join
  * keys prune it), and still OOMs every executor at 100 TB because the
  * whole corpus materializes in each JVM before the join runs.
  *
  * Every explicit `broadcast(...)` hint in a registered `ann_*`/`emb_*`
  * plan must therefore be bounded BY CONSTRUCTION, provable from the
  * broadcast subtree itself:
  *  - the strided query batch ([[Similarity.queryBatch]] — the
  *    `pmod(vec_id, QueryStride) = 0` filter survives into the subtree);
  *  - an aggregated table (centroids, label counts, 1-row totals — a
  *    HashAggregate/SortAggregate sits in the subtree, output bounded by
  *    group-key cardinality, never raw data size); or
  *  - the literal id-capped codebook prefix (`vec_id < codebookK`).
  * A broadcast of the raw corpus matches none of these and fails here —
  * exactly the lshScored/adcRerank/maxSimRerank defect of round 8.
  *
  * AQE and auto-broadcast are disabled for the sweep so the physical plan
  * contains exactly the HINTED broadcasts — the design decisions — and
  * none of the fixture-size-dependent planner choices that would both
  * mask design errors and flake with statistics.
  */
class BroadcastBoundSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every sim/emb broadcast build side is strided, aggregated, or id-capped") {
    val names = SparkEntry.queries.keys
      .filter(n => n.startsWith("ann_") || n.startsWith("emb_")).toSeq.sorted
    assert(names.nonEmpty)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // kmeans_step2 broadcasts the round-1 centroid table (k rows, bounded
    // by k) whose aggregate lineage localCheckpoint truncates to a Scan
    // ExistingRDD — the one bounded shape the subtree cannot prove itself;
    // the exception is keyed to that exact scan node, nothing wider.
    // r13: the power-iteration queries broadcast their per-step 1-ROW
    // checkpointed (mu, direction) aggregates — same truncated-lineage
    // shape, bounded at exactly one row by the global agg that built them
    val checkpointedBounded = Set("emb_kmeans_step2", "emb_whiten2", "emb_power_curve")
    // grouping keys whose cardinality is bounded by construction, not by
    // the data: cluster/centroid ids (≤ k), class labels, codebook
    // subspace ids. An aggregate grouped on a corpus-grain key (doc ids,
    // candidate pairs, vec_id) is still data-sized and must NOT count as
    // bounded (ADVICE r9: the old substring-"Aggregate" check would have
    // passed a distinct-over-pairs broadcast).
    val boundedGroupKeys = Set("label", "cid", "centroid_id", "cluster",
      "sub", "subspace", "code", "probe_cid",
      // per-dimension stats (emb_dim_fences): ≤ embedding dims rows
      "dim",
      // histogram bin index (emb_psi_incr reference counts): clamped to
      // the literal bins-1 ceiling by construction
      "__bin")
    try {
      val idCap = "vec_id < \\d+".r
      names.foreach { name =>
        val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan
        val broadcasts = plan.collect { case b: BroadcastExchangeExec => b }
        broadcasts.foreach { b =>
          // a ReusedExchangeExec is a LEAF whose toString hides the
          // referenced exchange's subtree — the r15 scan fan-out made
          // strided batches share the repartition exchange with the
          // corpus side, so the stride filter lives inside the reuse
          // target; expand targets so the boundedness proof sees them
          // (an actually-unbounded broadcast still fails: the expansion
          // shows the raw scan with no filter)
          def expand(p: org.apache.spark.sql.execution.SparkPlan): String =
            p.toString + p.collect {
              case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
                "\n-- reused exchange target --\n" + expand(r.child)
            }.mkString
          val sub = expand(b.child).replaceAll("#\\d+L?", "")
          val strided = sub.contains(s"pmod(vec_id, ${Similarity.QueryStride})")
          // the aggregate must BOUND THE SUBTREE ROOT, not merely appear
          // somewhere in it: a preorder collectFirst would find a bounded
          // aggregate below a Join(agg, corpusScan) build side and pass a
          // corpus-sized broadcast (ADVICE r10 — the narrower cousin of
          // the r9 substring-"Aggregate" hole). Descend only through
          // nodes that cannot grow their child's output data-sized:
          // unary projections/filters/exchanges/sorts (Generate fans out
          // by array size, excluded), and binary nodes only when BOTH
          // sides prove bounded — |bounded × bounded| is bounded.
          def keysBounded(a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec): Boolean =
            a.groupingExpressions.isEmpty ||
              a.groupingExpressions.forall(g =>
                boundedGroupKeys(g.name) ||
                  g.references.forall(r => boundedGroupKeys(r.name)))
          def boundedByAgg(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
            case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => keysBounded(a)
            case _: org.apache.spark.sql.execution.GenerateExec => false
            // descend into the reuse target — same subtree, same bound
            case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
              boundedByAgg(r.child)
            case u: org.apache.spark.sql.execution.UnaryExecNode => boundedByAgg(u.child)
            case j: org.apache.spark.sql.execution.BinaryExecNode =>
              boundedByAgg(j.left) && boundedByAgg(j.right)
            case _ => false
          }
          val aggregated = boundedByAgg(b.child)
          val capped = idCap.findFirstIn(sub).isDefined
          val checkpointed = checkpointedBounded(name) && sub.contains("Scan ExistingRDD")
          assert(strided || aggregated || capped || checkpointed,
            s"$name broadcasts a build side that is neither the strided query " +
              s"batch, a bounded-key aggregate, nor an id-capped codebook — a " +
              s"corpus-sized broadcast at scale:\n$sub")
        }
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }
}
