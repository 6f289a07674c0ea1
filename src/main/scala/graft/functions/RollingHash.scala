package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash: fold `(acc * 31 + codepoint) % (1e9+7)`
  * over a string's code points — t6's fingerprint, previously a
  * transform+aggregate pair over a materialized per-character int array
  * (interpreted CodegenFallback, one lambda eval per character).
  *
  * Semantics equal the composed form exactly: Spark `length`/`substr`/
  * `ascii` operate on code points, as does the iteration below (ASCII fast
  * path on raw bytes, code-point loop otherwise), and the DuckDB oracle's
  * `list_reduce` fold is the same sequence of exact integer ops.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  private val P = 1000000007L

  /** Shared by interpreted eval and generated code. */
  def parse(s: UTF8String): Long = {
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      val b = s.getByte(i)
      if (b < 0) ascii = false
      else { acc = (acc * 31 + b) % P; i += 1 }
    }
    if (ascii) acc
    else {
      // non-ASCII tail: fall back to a code-point walk (matches ascii(substr))
      val str = s.toString
      acc = 0L
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        acc = (acc * 31 + cp) % P
        j += Character.charCount(cp)
      }
      acc
    }
  }

  /** Column-DSL wrapper. */
  def rollingHash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
