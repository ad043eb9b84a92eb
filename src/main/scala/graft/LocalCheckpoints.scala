package graft

import org.apache.spark.sql.DataFrame

/** Shared helper for freeing `localCheckpoint` blocks.
  *
  * localCheckpoint RDDs are NOT tracked by the CacheManager
  * (`catalog.clearCache()` cannot touch them) and only fall to the
  * ContextCleaner after a JVM GC, so iterative operators that checkpoint
  * per round must free retired intermediates explicitly or they pin
  * storage memory for the life of the session.
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
