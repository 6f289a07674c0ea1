package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two array<double> columns — the inner loop of
  * every similarity operator (s1 brute-force kNN, s2 LSH ANN, s3 near-dup).
  *
  * The composed form `aggregate(zip_with(a, b, _*_), 0d, _+_)` is correct
  * but runs on the interpreted CodegenFallback path (higher-order functions
  * don't participate in whole-stage codegen) and allocates a zipped array
  * per evaluation. At pair-join cardinalities that interpreter overhead
  * dominates; this expression is the justified drop to a native `Expression`
  * (builder brief's extension ladder): one fused loop, no allocation,
  * codegen'd into the enclosing stage.
  *
  * Semantics match the composed form exactly where it is defined: sequential
  * left-to-right summation (bit-identical to DuckDB's `list_sum` fold — the
  * oracle is unchanged), null if either array or any element is null.
  * Length mismatch yields null (the composed form's zip-pad-null collapses
  * to null too).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(DoubleType, containsNull = true) ||
      left.dataType == ArrayType(DoubleType, containsNull = false))
      if (right.dataType == ArrayType(DoubleType, containsNull = true) ||
        right.dataType == ArrayType(DoubleType, containsNull = false))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName right child must be array<double>, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName left child must be array<double>, got ${left.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = ctx.freshName("a")
    val b = ctx.freshName("b")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    ev.copy(code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $a = ${leftGen.value};
          org.apache.spark.sql.catalyst.util.ArrayData $b = ${rightGen.value};
          int $n = $a.numElements();
          if ($n == $b.numElements()) {
            ${ev.isNull} = false;
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
              ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
            }
          }
        }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-DSL wrapper. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
