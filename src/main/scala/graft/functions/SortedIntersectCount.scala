package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: intersection SIZE of two string arrays that
  * are each sorted ascending (binary UTF8 order — what `array_sort` /
  * `sort_array` produce) and duplicate-free, via a single counting merge
  * walk.
  *
  * The declarative equivalent — `size(array_intersect(a, b))` — builds a
  * hash set of one side and materializes the whole intersection array per
  * row, only for `size()` to throw it away. The candidate-pair
  * verification loops ([[graft.dedup.Dedup.prefixJaccard]],
  * [[graft.dedup.Dedup.minhashQuality]]) evaluate this once per candidate
  * pair — at 100 TB that's the hot path — so this expression counts
  * matches with zero allocation and stays inside whole-stage codegen.
  *
  * PRECONDITION: both arrays sorted ascending and distinct, no null
  * elements (the shingle-set builders guarantee all three). On unsorted
  * input the count is undefined — this is an internal building block, not
  * a general array function.
  *
  * Registered as `graft_sorted_intersect_count` by
  * [[GraftFunctions.register]].
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val (ln, rn) = (xs.numElements(), ys.numElements())
    var li = 0
    var ri = 0
    var cnt = 0L
    while (li < ln && ri < rn) {
      val cmp = xs.getUTF8String(li).compareTo(ys.getUTF8String(ri))
      if (cmp == 0) { cnt += 1; li += 1; ri += 1 }
      else if (cmp < 0) li += 1
      else ri += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ln = ctx.freshName("ln")
      val rn = ctx.freshName("rn")
      val li = ctx.freshName("li")
      val ri = ctx.freshName("ri")
      val cnt = ctx.freshName("cnt")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $ln = $a.numElements();
         |int $rn = $b.numElements();
         |int $li = 0;
         |int $ri = 0;
         |long $cnt = 0L;
         |while ($li < $ln && $ri < $rn) {
         |  int $cmp = $a.getUTF8String($li).compareTo($b.getUTF8String($ri));
         |  if ($cmp == 0) { $cnt++; $li++; $ri++; }
         |  else if ($cmp < 0) { $li++; } else { $ri++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
