package graft

import org.apache.spark.sql.DataFrame

/** Shared helper for freeing `localCheckpoint` blocks.
  *
  * localCheckpoint RDDs are NOT tracked by the CacheManager
  * (`catalog.clearCache()` cannot touch them) and only fall to the
  * ContextCleaner after a JVM GC, so iterative operators that checkpoint
  * per round must free retired intermediates explicitly or they pin
  * storage memory for the life of the session.
  *
  * == Cluster-scale posture (the 100 TB story) ==
  *
  * Every iterative operator in this engine (graph loops: components,
  * kCore/coreNumbers, trussPeel, bfsHops, cheapestPath, pageRank,
  * labelProp*, betweenness*, nnDescent; edge-contraction dedup
  * clustering; BPE merge rounds) uses `localCheckpoint` to cut lineage:
  * without it the per-round plan references its input 2–3×, the lineage
  * grows ~3^rounds, and the PLANNER dies before any data moves. On
  * `local[*]` this is free of risk. On a real cluster the trade is
  * explicit (guide §5): localCheckpoint pins blocks to the executors
  * that computed them — an executor loss makes the truncated lineage
  * UNRECOVERABLE (the job fails and restarts from the last durable
  * input) and blocks dynamic executor decommissioning. A long loop over
  * 100 TB should therefore swap the per-round `localCheckpoint()` for
  * reliable `checkpoint()` into a `sparkContext.setCheckpointDir` on
  * the cluster's DFS every K rounds (K ≈ 5–10 amortizes the DFS write
  * against the recompute-on-loss window), keeping localCheckpoint for
  * the intra-K rounds. The operators here keep the local flavor because
  * the bench contract is single-host: the swap is a one-line policy at
  * each `localCheckpoint()` call site, not an algorithm change.
  */
object LocalCheckpoints {

  /** Unpersist the checkpoint blocks behind a localCheckpoint'ed frame
    * (no-op for any other plan shape). Only call once the frame's data is
    * no longer needed — a localCheckpoint has no lineage to recompute.
    */
  def free(df: DataFrame): Unit = df.queryExecution.logical match {
    case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
    case _ => ()
  }
}
