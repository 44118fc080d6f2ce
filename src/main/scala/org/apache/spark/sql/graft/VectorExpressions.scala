package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, StringType}

/** Codegen'd dense-vector kernels (SURVEY §4.2: "custom Expression beats
  * UDF"). Spark's higher-order functions (`aggregate`/`zip_with`) evaluate
  * their lambdas interpreted, outside whole-stage codegen — at millions of
  * pair scorings that interpretation dominates. `FloatVecDot` emits a tight
  * primitive loop in generated Java instead.
  *
  * Lives under org.apache.spark.sql because the expression-to-Column bridge
  * (`classic.ExpressionUtils`) and `AbstractDataType` are private[sql] in
  * Spark 4.
  *
  * Accumulation is sequential in array order in BOTH eval paths, keeping
  * results bit-identical to the HOF formulation (and to the DuckDB oracle).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double)$a.getFloat($i) * (double)$b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd sorted-set intersection size: both inputs must be sorted
  * string arrays (array_sort order = UTF8String binary order, which is the
  * comparison used here). A single merge pass replaces Spark's
  * `array_intersect` (interpreted, hash-set based) in the exact-verify
  * step of near-dup joins, where it runs once per candidate pair.
  */
case class SortedStringArrayIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n1, n2) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < n1 && j < n2) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      s"""
         |int $n1 = $a.numElements();
         |int $n2 = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n1 && $j < $n2) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for graft code (bridges private[sql] API). */
object VectorExpressions {
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sortedIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedStringArrayIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
