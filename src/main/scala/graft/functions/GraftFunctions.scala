package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine-native function registrations (the SparkSessionExtensions-style
  * surface, applied directly to the session's function registry so it also
  * works on an externally created session — the driver hands us one).
  *
  * After [[register]], `call_function("graft_long_dot", a, b)` and SQL
  * `graft_long_dot(a, b)` resolve to the codegen'd [[LongDotProduct]].
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_long_dot" -> {
      case Seq(a, b) => LongDotProduct(a, b)
      case other =>
        throw new IllegalArgumentException(
          s"graft_long_dot expects 2 arguments, got ${other.length}")
    },
    // counting merge walk over two sorted distinct string arrays — the
    // allocation-free form of size(array_intersect(a, b)) for the
    // candidate-pair verification loops
    "graft_sorted_intersect_count" -> {
      case Seq(a, b) => SortedIntersectCount(a, b)
      case other =>
        throw new IllegalArgumentException(
          s"graft_sorted_intersect_count expects 2 arguments, got ${other.length}")
    },
    // the engine's deterministic 60-bit hash (Cols.hash60) as a native
    // codegen'd expression — digest bytes straight to long, no hex/decimal
    // string detour (bit-identical to the composed built-in form)
    "graft_hash60" -> {
      case Seq(s) => Hash60(s)
      case other =>
        throw new IllegalArgumentException(
          s"graft_hash60 expects 1 argument, got ${other.length}")
    }
  )

  /** The registrations as SparkSessionExtensions.injectFunction triples —
    * shared by [[register]] (post-hoc, externally created session) and
    * [[graft.GraftExtensions]] (declarative `spark.sql.extensions` path).
    */
  val injections: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    fns.map { case (name, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo("graft.functions", name), builder)
    }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    injections.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
