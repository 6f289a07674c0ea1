package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: parse the first `n` lowercase-hex chars of a
  * string into a BIGINT — the base-hash step of the MinHash family
  * (Dedup.sigs), where it replaces an 8-term `instr`/`substr` expression
  * chain evaluated once per shingle.
  *
  * This is the one place the engine drops below `functions._`: the chain is
  * hot (one eval per shingle per corpus pass), allocation-heavy as eight
  * separate Substring/StringInstr nodes, and semantically a single tight
  * loop. Per the extension ladder (builder brief), a native `Expression`
  * with `doGenCode` beats a Scala UDF: nulls propagate structurally, the
  * value never boxes, and codegen emits a static call.
  *
  * Semantics mirror the SQL chain exactly (and therefore the DuckDB oracle):
  * digit = position in `0123456789abcdef` minus one (-1 for non-hex bytes,
  * uppercase NOT matched, positions past the end contribute 0), folded as
  * `acc*16 + digit`. Inputs are ASCII hex (md5 output) by contract.
  */
case class HexPrefixToLong(child: Expression, n: Int = 8)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "hex_prefix_to_long"

  override def nullSafeEval(input: Any): Any =
    HexPrefixToLong.parse(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HexPrefixToLong.parse($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): HexPrefixToLong =
    copy(child = newChild)
}

object HexPrefixToLong {
  /** Shared by interpreted eval and generated code. */
  def parse(s: UTF8String, n: Int): Long = {
    val len = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      val d: Long =
        if (i >= len) 0L                       // instr(alphabet,'')-1 == 0
        else {
          val b = s.getByte(i)
          if (b >= '0' && b <= '9') (b - '0').toLong
          else if (b >= 'a' && b <= 'f') (b - 'a' + 10).toLong
          else -1L                             // instr miss → 0-1
        }
      acc = acc * 16 + d
      i += 1
    }
    acc
  }

  /** Column-DSL wrapper (usable inside higher-order-function lambdas). */
  def hex8(c: Column): Column =
    ColumnBridge.column(HexPrefixToLong(ColumnBridge.expression(c), 8))
}
