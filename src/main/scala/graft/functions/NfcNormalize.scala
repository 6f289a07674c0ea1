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
  /** Shared by interpreted eval and generated code. Three tiers, each
    * bounding the work the tier above would waste (the x34 streaming
    * audit pays this per arriving document, so the clean and the
    * almost-clean cases must both be near-free):
    *  1. pure-ASCII input (the overwhelming case in a crawl corpus) is
    *     NFC by construction — one byte scan, no String allocation;
    *  2. code points below U+0300 are NFC-inert (NFC_QC=Yes, ccc=0, and
    *     never the second element of a canonical composition — the same
    *     fact ICU's Latin fast path relies on), so a maximal inert
    *     prefix is already normalized and nothing composes or reorders
    *     across a boundary placed one char before the first non-inert
    *     char (that one backed-up starter joins the tail so a leading
    *     combining mark still finds it);
    *  3. only the tail from that boundary is quick-checked and, when
    *     non-NFC, normalized — O(|tail|) allocation instead of O(|doc|)
    *     for the common "long clean document, short hostile suffix"
    *     shape (measured: x34's decomposed-suffix injection).
    */
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    var j = 0
    val n = str.length
    while (j < n && str.charAt(j) < 0x300) j += 1
    if (j == n) return s
    val cut = if (j == 0) 0 else j - 1
    val tail = if (cut == 0) str else str.substring(cut)
    if (Normalizer.isNormalized(tail, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      str.substring(0, cut) + Normalizer.normalize(tail, Normalizer.Form.NFC))
  }

  /** Column-DSL wrapper. */
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
