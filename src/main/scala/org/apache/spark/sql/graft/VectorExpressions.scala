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

/** Per-row IVF kernels: centroid assignment/probing against a small
  * driver-collected centroid table. The round-1 formulation cross-joined
  * the corpus with the broadcast centroids (k× row blowup) and picked the
  * argmax with a ranking window — one shuffle + sort of the k×n stream.
  * These kernels do the argmax in one loop per row, so assignment is a
  * pure scan-side projection: zero shuffles, no row blowup. Semantics are
  * pinned to the window formulation (IvfParitySpec): cosine is computed
  * exactly like Vectors.cosine (min-length dot, full-length norms,
  * null when norm-product is 0 — skipped, so a degenerate vector can
  * never win), ties break toward the smallest centroid id.
  */
object VectorKernels {

  /** (cos, valid): Vectors.cosine(v, w) replicated — null ⇒ valid=false. */
  private def cosine(v: ArrayData, w: Array[Float]): Double = {
    val nv = v.numElements()
    val nd = math.min(nv, w.length)
    var d = 0.0; var da = 0.0; var db = 0.0
    var i = 0
    while (i < nd) { d += v.getFloat(i).toDouble * w(i).toDouble; i += 1 }
    i = 0
    while (i < nv) { val x = v.getFloat(i).toDouble; da += x * x; i += 1 }
    i = 0
    while (i < w.length) { val x = w(i).toDouble; db += x * x; i += 1 }
    val n = math.sqrt(da) * math.sqrt(db)
    if (n > 0) d / n else Double.NaN // NaN = the when()'s null branch
  }

  /** Nearest centroid id (argmax cosine, ties → smallest id; `ids` must
    * be sorted ascending with `vecs` aligned). */
  def nearestCentroid(v: ArrayData, ids: Array[Long],
                      vecs: Array[Array[Float]]): Long = {
    var best = ids(0)
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < ids.length) {
      val cos = cosine(v, vecs(c))
      if (!cos.isNaN && cos > bestCos) { best = ids(c); bestCos = cos }
      c += 1
    }
    best
  }

  /** Strongest benchmark witness: (argmax-cosine id, that cosine) —
    * [[nearestCentroid]]'s loop keeping the winning cosine too, the
    * scan-side body of embedding-level decontamination (x231). Ties →
    * smallest id (`ids` sorted ascending, strict `>`); degenerate
    * inputs (every cosine NaN) return null. */
  def bestMatch(v: ArrayData, ids: Array[Long],
                vecs: Array[Array[Float]])
      : org.apache.spark.sql.catalyst.InternalRow = {
    var best = -1
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < ids.length) {
      val cos = cosine(v, vecs(c))
      if (!cos.isNaN && cos > bestCos) { best = c; bestCos = cos }
      c += 1
    }
    if (best < 0) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ids(best), bestCos))
  }

  /** The `nprobe` nearest centroid ids, by (cosine desc, id asc); null
    * cosines order last (matching the ranking-window formulation). */
  def probeCentroids(v: ArrayData, ids: Array[Long],
                     vecs: Array[Array[Float]], nprobe: Int): ArrayData = {
    val k = ids.length
    val cos = new Array[Double](k)
    var c = 0
    while (c < k) { cos(c) = cosine(v, vecs(c)); c += 1 }
    val take = math.min(nprobe, k)
    val out = new Array[Long](take)
    val used = new Array[Boolean](k)
    var slot = 0
    while (slot < take) {
      var best = -1
      var i = 0
      while (i < k) {
        if (!used(i)) {
          if (best < 0) best = i
          else {
            val a = cos(i); val b = cos(best)
            // desc by cos with NaN (null) last; ids ascending break ties
            val aBeats =
              (!a.isNaN && (b.isNaN || a > b))
            if (aBeats) best = i
          }
        }
        i += 1
      }
      used(best) = true
      out(slot) = ids(best)
      slot += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class NearestCentroidExpr(child: Expression, ids: Array[Long],
                               vecs: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    VectorKernels.nearestCentroid(input.asInstanceOf[ArrayData], ids, vecs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val vecsRef = ctx.addReferenceObj("centVecs", vecs, "float[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = org.apache.spark.sql.graft.VectorKernels.nearestCentroid(
      |  $c, $idsRef, $vecsRef);
      |""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class BestMatchExpr(child: Expression, ids: Array[Long],
                         vecs: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("bench_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("sim",
      org.apache.spark.sql.types.DoubleType)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    VectorKernels.bestMatch(input.asInstanceOf[ArrayData], ids, vecs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("benchIds", ids, "long[]")
    val vecsRef = ctx.addReferenceObj("benchVecs", vecs, "float[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = org.apache.spark.sql.graft.VectorKernels.bestMatch(
      |  $c, $idsRef, $vecsRef);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
      |""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ProbeCentroidsExpr(child: Expression, ids: Array[Long],
                              vecs: Array[Array[Float]], nprobe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    VectorKernels.probeCentroids(input.asInstanceOf[ArrayData], ids, vecs, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val vecsRef = ctx.addReferenceObj("centVecs", vecs, "float[][]")
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = org.apache.spark.sql.graft.VectorKernels.probeCentroids(
      |  $c, $idsRef, $vecsRef, $nprobe);
      |""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points for graft code (bridges private[sql] API). */
object VectorExpressions {
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatVecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def sortedIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedStringArrayIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def nearestCentroid(v: Column, ids: Array[Long],
                      vecs: Array[Array[Float]]): Column =
    ExpressionUtils.column(NearestCentroidExpr(
      ExpressionUtils.expression(v), ids, vecs))

  def probeCentroids(v: Column, ids: Array[Long], vecs: Array[Array[Float]],
                     nprobe: Int): Column =
    ExpressionUtils.column(ProbeCentroidsExpr(
      ExpressionUtils.expression(v), ids, vecs, nprobe))

  def bestMatch(v: Column, ids: Array[Long],
                vecs: Array[Array[Float]]): Column =
    ExpressionUtils.column(BestMatchExpr(
      ExpressionUtils.expression(v), ids, vecs))
}
