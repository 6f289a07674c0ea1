package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first 32 bits of md5(input) as a BIGINT —
  * bit-identical to `hex_prefix_to_long(md5(x), 8)` (the md5 hex string is
  * the big-endian hex of the digest), but FUSED: no 32-char hex string is
  * ever materialized.
  *
  * This is the single hottest expression in the engine: the shingle-hash
  * pipeline (Dedup.sigs / hashSets, feeding d2/d3/d4/d9) evaluates it once
  * per shingle per corpus pass, which at 100 TB is the dominant dedup cost.
  * `md5(x)` alone allocates a 32-byte UTF8String per call plus the
  * hex-encoding loop; this expression goes digest → long directly off a
  * thread-local MessageDigest (codegen emits one static call, value never
  * boxes, nulls propagate structurally).
  *
  * The DuckDB oracle keeps the two-step spelling
  * (`instr`-chain over `md5(x)`) — same values by construction.
  */
case class Md5Hash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash32"

  override def nullSafeEval(input: Any): Any =
    Md5Hash32.hash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash32.hash32($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash32 =
    copy(child = newChild)
}

object Md5Hash32 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code. */
  def hash32(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    md.update(s.getBytes)
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Column-DSL wrapper (usable inside higher-order-function lambdas). */
  def hash32(c: Column): Column =
    ColumnBridge.column(Md5Hash32(ColumnBridge.expression(c)))
}
