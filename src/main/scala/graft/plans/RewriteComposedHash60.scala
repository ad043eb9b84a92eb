package graft.plans

import graft.functions.Hash60
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, StringType}

/** Optimizer rule: recognize the PORTABLE spelling of the engine's 60-bit
  * hash — `conv(substr(md5(x), 1, 15), 16, 10)::long`, the form a user
  * writes to stay compatible with DuckDB/Trino — and substitute the
  * native codegen'd [[Hash60]] expression (identical bits, no hex/decimal
  * string detour; ~2× on hash-heavy scans).
  *
  * This is the "engine recognizes an idiom and swaps in its native
  * implementation" pattern: SQL authored against the open spelling gets
  * the fast path without a rewrite. Installed by `GraftSession.tune` via
  * `spark.experimental.extraOptimizations` (the post-hoc injection point
  * for a session the driver hands us; `SparkSessionExtensions
  * .injectOptimizerRule` is the equivalent at session-build time).
  *
  * Matches any cast-to-long of `conv(substr(md5(b), 1, 15), 16, 10)`
  * where `b` is a string (possibly via an intermediate cast to binary,
  * which is how `md5(string)` analyzes). The rule is a pure expression
  * substitution — idempotent, and a no-op on any other Conv/Md5 use.
  */
object RewriteComposedHash60 extends Rule[LogicalPlan] {

  private object HashableInput {
    /** The string argument feeding md5: either a direct string child or
      * the analyzer's string→binary cast wrapper.
      */
    def unapply(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Option[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
      case c: Cast if c.child.dataType == StringType => Some(c.child)
      case s if s.dataType == StringType => Some(s)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case c: Cast if c.dataType == LongType =>
        c.child match {
          case Conv(
                Substring(Md5(HashableInput(s)), Literal(1, _), Literal(15, _)),
                Literal(16, _), Literal(10, _), _) =>
            Hash60(s)
          case _ => c
        }
    }
}
