package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused text → 3-gram shingle-hash32 array (OPTIMIZATION r18, guide §1.2
  * step 2 / brief item 4 "eliminate non-codegen expressions in the hot
  * path").
  *
  * The composed Column spelling
  * `array_sort(array_distinct(transform(shinglesOf(split(text)), md5_hash32)))`
  * is built from higher-order functions, which are CodegenFallback: the
  * whole chain evaluates INTERPRETED, the `split` inside the shingle
  * lambda re-evaluates once per shingle (O(tokens²) per doc), and
  * `InferFiltersFromGenerate` duplicates the entire chain into a
  * `size(..) > 0 AND isnotnull(..)` filter under every explode of it —
  * measured 1.4 s for TEN 300-char docs (thread dumps:
  * ArrayTransform.eval → ConcatWs.eval → StringSplit.nullSafeEval inside a
  * generated Filter predicate). This expression computes the identical
  * value in one tight pass over the text bytes, codegen-friendly, so even
  * a duplicated evaluation is microseconds.
  *
  * Exact equivalence with the composed spelling (pinned in
  * ShingleHashSpec):
  *  - tokens = split(text, " ", -1): split on every single 0x20 byte,
  *    keeping empty tokens (leading/trailing/consecutive spaces) — a
  *    space byte never occurs inside a UTF-8 multibyte sequence, so the
  *    byte scan equals the regex split.
  *  - shingle k = concat_ws(" ", tokens[k..k+2]). Re-joining with the
  *    single spaces the split removed means shingle k is EXACTLY the
  *    original text bytes from the start of token k to the end of token
  *    k+2 — so the md5 runs over a zero-copy slice of the input.
  *  - < 3 tokens (and NULL text, via shinglesOf's when/otherwise) → empty
  *    array, never null.
  *  - distinctSorted=true appends array_sort(array_distinct(..)):
  *    ascending sort, first-occurrence dedup — over longs both equal
  *    sorted-unique.
  */
case class ShingleHash32s(child: Expression, distinctSorted: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String =
    if (distinctSorted) "shingle_hash32_set" else "shingle_hash32s"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleHash32.emptyArray()
    else ShingleHash32.hashes(v.asInstanceOf[UTF8String], distinctSorted)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? graft.functions.ShingleHash32.emptyArray()
            : graft.functions.ShingleHash32.hashes(${c.value}, $distinctSorted);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHash32s =
    copy(child = newChild)
}

/** All 16 affine minhash signatures in ONE pass over a bigint hash array —
  * replaces 16 separate `array_min(transform(hv, h -> (a·h+b) % P))`
  * higher-order (interpreted, per-element-boxing) expressions per row.
  * NULL or empty input → NULL (array_min-over-empty semantics, so
  * `s0 IS NOT NULL` keeps meaning "doc has shingles"). Output is always a
  * 16-element array; sig j at 1-based position j+1. */
case class AffineMinSigs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> child, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "affine_min_sigs"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() == 0) null else ShingleHash32.affineMinSigs(a)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${c.isNull} && ${c.value}.numElements() > 0) {
          ${ev.value} = graft.functions.ShingleHash32.affineMinSigs(${c.value});
          ${ev.isNull} = false;
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildInternal(newChild: Expression): AffineMinSigs =
    copy(child = newChild)
}

object ShingleHash32 {
  /** The affine minhash family constants — the single source of truth
    * shared with Dedup's oracle-side SQL mirrors. */
  val P = 1000000007L
  val hashA: Seq[Long] = Seq(131L, 9973L, 999331L, 22695477L, 747796405L,
    69069L, 48271L, 16807L, 69621L, 40692L, 40014L, 65539L, 214013L,
    134775813L, 999999893L, 536870909L)
  val hashB: Seq[Long] = Seq(17L, 911L, 65599L, 104729L, 50331653L,
    998244353L, 7919L, 104659L, 1299709L, 15485863L, 32452843L, 49979687L,
    67867967L, 86028121L, 982451653L, 377777777L)

  private val aArr = hashA.toArray
  private val bArr = hashB.toArray

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val empty: ArrayData = UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
  def emptyArray(): ArrayData = empty

  /** text → hash32 per 3-gram shingle; shared by interpreted eval and
    * generated code. */
  def hashes(s: UTF8String, distinctSorted: Boolean): ArrayData = {
    val bytes = s.getBytes
    // token boundaries: split on every 0x20 byte, empty tokens kept
    var nTok = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) nTok += 1
      i += 1
    }
    if (nTok < 3) return empty
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    val n = nTok - 2
    val out = new Array[Long](n)
    val md = digests.get()
    var k = 0
    while (k < n) {
      // shingle k == original bytes [start(k), end(k+2)) — see class doc
      md.reset()
      md.update(bytes, starts(k), ends(k + 2) - starts(k))
      val d = md.digest()
      out(k) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      k += 1
    }
    if (!distinctSorted) return UnsafeArrayData.fromPrimitiveArray(out)
    java.util.Arrays.sort(out)
    var m = 0
    var j = 0
    while (j < n) {
      if (m == 0 || out(j) != out(m - 1)) { out(m) = out(j); m += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, m))
  }

  /** One pass over a non-empty hash array → the 16 affine minima. */
  def affineMinSigs(hv: ArrayData): ArrayData = {
    val n = hv.numElements()
    val out = new Array[Long](aArr.length)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hv.getLong(i)
      var j = 0
      while (j < aArr.length) {
        val v = (aArr(j) * h + bArr(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column DSL: raw in-order shingle hashes (the signature source). */
  def raw(c: Column): Column =
    ColumnBridge.column(ShingleHash32s(ColumnBridge.expression(c), distinctSorted = false))

  /** Column DSL: sorted distinct shingle-hash set (the verify-side form). */
  def set(c: Column): Column =
    ColumnBridge.column(ShingleHash32s(ColumnBridge.expression(c), distinctSorted = true))

  /** Column DSL: 16 affine minhash sigs over a hash array (null-safe). */
  def sigs(c: Column): Column =
    ColumnBridge.column(AffineMinSigs(ColumnBridge.expression(c)))
}
