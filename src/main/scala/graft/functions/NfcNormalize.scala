package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string —
  * the canonicalization step every text-dedup pipeline needs before
  * fingerprinting (a composed "é" (U+00E9) and its decomposed twin
  * "e"+U+0301 are byte-DIFFERENT but render identically, so raw md5
  * fingerprints silently miss the duplicate; t42 measures the exposure,
  * d38's canonicalization ladder measures what fixing it unlocks).
  *
  * Spark has no built-in normalizer, and a Scala UDF here would break
  * whole-stage codegen on the corpus-linear canonicalization pass — so
  * this is a codegen'd UnaryExpression over `java.text.Normalizer`
  * (ICU-equivalent NFC per Unicode TR15; DuckDB's `nfc_normalize`
  * implements the same algorithm, so canonical forms — and therefore
  * fingerprints — agree across engines; the hash gate is that proof).
  * The already-NFC fast path (`Normalizer.isNormalized`, a scan without
  * allocation) keeps the common case — clean ASCII/NFC corpora — at
  * zero-copy cost: the input UTF8String is returned as-is.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-DSL wrapper. */
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
