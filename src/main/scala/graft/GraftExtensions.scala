package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Declarative installer for the engine's session surface — the idiomatic
  * library packaging for a cluster where the session is built by the
  * platform, not by application code:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Installs at session build time:
  *  - the native codegen'd SQL functions (`graft_long_dot`,
  *    `graft_hash60`) — [[graft.functions.GraftFunctions]]
  *  - the idiom-recognition optimizer rule that rewrites the portable
  *    composed-md5 hash SQL onto the native expression —
  *    [[graft.plans.RewriteComposedHash60]]
  *
  * [[GraftSession.tune]] remains the post-hoc twin for sessions created
  * without this hook (the driver hands us one); both paths register the
  * identical functions and rule, so library code behaves the same either
  * way. Runtime confs (AQE, timezone, nanos handling) stay in `tune` —
  * they are dynamic and do not belong in a build-time extension.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.injections.foreach(extensions.injectFunction)
    extensions.injectOptimizerRule(_ => graft.plans.RewriteComposedHash60)
  }
}
