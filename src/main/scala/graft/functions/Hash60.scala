package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's deterministic 60-bit hash
  * (first 60 bits of md5), bit-identical to the composed form
  * `conv(substr(md5(s), 1, 15), 16, 10)::long` (Cols.hash60) and to
  * DuckDB's `('0x' || substr(md5(s), 1, 15))::BIGINT` — the oracles are
  * unchanged.
  *
  * Why native: the composed form allocates the 32-char hex string, a
  * 15-char substring, and a decimal string (Conv) per call, and the
  * MinHash hot path calls it 16× per shingle row. This expression goes
  * digest-bytes → long directly (first 8 bytes big-endian, logical
  * shift right 4 ≡ parsing the first 15 hex chars) with a thread-local
  * MessageDigest, and stays inside whole-stage codegen via a single
  * static call.
  *
  * Registered as `graft_hash60` by [[GraftFunctions.register]].
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(utf8 bytes of s): digest bytes 0..7 as a
    * big-endian long, >>> 4 — exactly the value of the first 15 hex
    * digits (each byte contributes two hex chars; dropping the low
    * nibble of byte 7 drops the 16th char).
    */
  def hash(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    val be =
      ((digest(0) & 0xffL) << 56) | ((digest(1) & 0xffL) << 48) |
        ((digest(2) & 0xffL) << 40) | ((digest(3) & 0xffL) << 32) |
        ((digest(4) & 0xffL) << 24) | ((digest(5) & 0xffL) << 16) |
        ((digest(6) & 0xffL) << 8) | (digest(7) & 0xffL)
    be >>> 4
  }
}
