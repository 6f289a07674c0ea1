package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the 32-bit Morton (Z-order) code of two
  * 16-bit values — x's bits at even positions, y's at odd. The multi-
  * dimensional data-layout key: sorting a table by `morton16(a, b)` keeps
  * rows close in BOTH dimensions close in the file order, so min/max
  * zone-map pruning (parquet row-group/file stats) cuts 2-D box queries
  * where a linear sort prunes only its leading column (Morton, 1966; the
  * layout story behind Delta OPTIMIZE ZORDER BY and friends — implemented
  * here from the public bit-interleaving construction).
  *
  * Inputs beyond 16 bits are masked (`& 0xFFFF`): callers quantize or
  * bucket first (q38 uses natural 16-bit-ranged keys; a production layout
  * would rank-bucket each column to 16 bits, which also equalizes skew).
  * The bit-spread is the standard O(log w) shift-or cascade, codegen'd to
  * one static call — no per-row loop, no boxing.
  *
  * The DuckDB oracle spells the same value as the 32-term
  * Σ bit_i(x)·4^i + 2·bit_i(y)·4^i sum (generated, not hand-written);
  * bit-identical by construction.
  */
case class MortonCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint children, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "morton16"

  override def nullSafeEval(x: Any, y: Any): Any =
    MortonCode.morton16(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.MortonCode.morton16($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonCode =
    copy(left = newLeft, right = newRight)
}

object MortonCode {
  /** Spread the low 16 bits of v to the even bit positions of a 32-bit word. */
  private def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Shared by interpreted eval and generated code. */
  def morton16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** Column-DSL wrapper. */
  def morton16(x: Column, y: Column): Column =
    ColumnBridge.column(
      MortonCode(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** The identical value as portable SQL (the DuckDB oracle's spelling):
    * Σ_i ((x div 2^i) % 2)·4^i + 2·((y div 2^i) % 2)·4^i, over the input
    * reduced to its low 16 bits FIRST — `(v % 65536 + 65536) % 65536` is
    * the two's-complement low-16 mask for negative values too, matching
    * the native `& 0xFFFF` (DuckDB's `%` follows the dividend sign, so
    * the bare bit-sum would emit negative garbage terms for a negative
    * input where the native expression masks). */
  def mortonSql(x: String, y: String): String = {
    def m16(v: String) = s"((($v) % 65536 + 65536) % 65536)"
    (0 until 16).flatMap { i =>
      val p4 = 1L << (2 * i)
      Seq(s"((${m16(x)} // ${1L << i}) % 2) * $p4",
        s"((${m16(y)} // ${1L << i}) % 2) * ${2 * p4}")
    }.mkString(" + ")
  }
}
