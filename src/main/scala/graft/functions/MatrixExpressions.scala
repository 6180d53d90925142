package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expressions for the vector-vs-MATRIX kernels: one row
  * vector against a fixed set of hyperplanes or centroids (LSH sign
  * buckets, banded buckets, k-means cell assignment).
  *
  * WHY these exist — the k-LITERAL PLAN DISEASE, measured in round 6
  * (BASELINE.md): building one literal-array column per plane/centroid
  * (`array(lit…)` × k with a dot each) makes PLAN/CODEGEN cost grow with k
  * until it dominates the query regardless of data volume (semanticDedup
  * k=8 2.8 s → k=32 3.9 s on a clean window; cosineNearDup H=30 1.61 s).
  * Round 6 cured two call sites with broadcast+compiled-UDF passes; these
  * expressions finish the job: the matrix rides the expression tree as ONE
  * reference object (`ctx.addReferenceObj`, the same mechanism Literal uses
  * for non-primitive values), the plan is O(1) in k, and the loop runs as a
  * primitive `getFloat` nest INSIDE whole-stage codegen — no `Seq[Float]`
  * boxing per row, no codegen boundary (the residual UDF cost
  * [[VectorExpressions]] eliminated for dot/cosine/norm).
  *
  * Numerics are bit-identical to the column/UDF forms they replace: double
  * accumulators folded in ascending element order over the min common
  * length, strict `> 0` sign tests, first-max tie-breaks.
  *
  * Note one deliberate null-semantics change in [[FloatSignBucket]]: the old
  * column composition (`sum of when(dot > 0, 2^i)`) mapped a NULL vector to
  * bucket 0 (each `when` fell to `otherwise(0)`); the native form is
  * null-in → null-out like every other kernel, so a null vector can never
  * alias the legitimate all-negative bucket.
  */
object MatrixExpressions {

  def signBucket(vec: Column, planes: Array[Array[Float]]): Column =
    ColumnBridge.column(FloatSignBucket(ColumnBridge.expression(vec), planes))

  def bandBuckets(vec: Column, bands: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(FloatBandBuckets(ColumnBridge.expression(vec), bands))

  def topDotCells(vec: Column, centroids: Array[Array[Double]], ids: Array[Long],
      p: Int): Column =
    ColumnBridge.column(FloatTopDotCells(ColumnBridge.expression(vec), centroids, ids, p))
}

/** LSH sign bucket: bit i = (v · planes(i) > 0), i ascending from bit 0.
  * Equal to `Σ when(float_dot(v, planes(i)) > 0, 1L << i)` with the plan
  * O(1) in the plane count.
  */
case class FloatSignBucket(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression with ExpectsInputTypes {

  require(planes.length <= 62, s"at most 62 hyperplanes fit a long bucket (got ${planes.length})")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "float_sign_bucket"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    var b = 0L
    var i = 0
    while (i < planes.length) {
      val h = planes(i)
      var d = 0.0
      var j = 0
      val n = math.min(h.length, v.numElements())
      while (j < n) { d += h(j).toDouble * v.getFloat(j).toDouble; j += 1 }
      if (d > 0) b |= 1L << i
      i += 1
    }
    b
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("planes", planes, "float[][]")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      s"""
         |long $b = 0L;
         |for (int $i = 0; $i < $p.length; $i++) {
         |  float[] $h = $p[$i];
         |  double $d = 0.0;
         |  int $n = java.lang.Math.min($h.length, $a.numElements());
         |  for (int $j = 0; $j < $n; $j++) {
         |    $d += (double) $h[$j] * (double) $a.getFloat($j);
         |  }
         |  if ($d > 0) $b |= 1L << $i;
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All banded LSH buckets in one pass: element t of the result is band t's
  * sign bucket (local bit i = (v · bands(t)(i) > 0)). `posexplode` the
  * result for the OR-of-ANDs (band, bucket) candidate key.
  */
case class FloatBandBuckets(child: Expression, bands: Array[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {

  require(bands.forall(_.length <= 62), "at most 62 planes per band fit a long bucket")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "float_band_buckets"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val out = new Array[Long](bands.length)
    var t = 0
    while (t < bands.length) {
      val hs = bands(t)
      var b = 0L
      var i = 0
      while (i < hs.length) {
        val h = hs(i)
        var d = 0.0
        var j = 0
        val n = math.min(h.length, v.numElements())
        while (j < n) { d += h(j).toDouble * v.getFloat(j).toDouble; j += 1 }
        if (d > 0) b |= 1L << i
        i += 1
      }
      out(t) = b
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bs = ctx.addReferenceObj("bands", bands, "float[][][]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val hs = ctx.freshName("hs")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      s"""
         |long[] $out = new long[$bs.length];
         |for (int $t = 0; $t < $bs.length; $t++) {
         |  float[][] $hs = $bs[$t];
         |  long $b = 0L;
         |  for (int $i = 0; $i < $hs.length; $i++) {
         |    float[] $h = $hs[$i];
         |    double $d = 0.0;
         |    int $n = java.lang.Math.min($h.length, $a.numElements());
         |    for (int $j = 0; $j < $n; $j++) {
         |      $d += (double) $h[$j] * (double) $a.getFloat($j);
         |    }
         |    if ($d > 0) $b |= 1L << $i;
         |  }
         |  $out[$t] = $b;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `ids` of the `p` centroids with the largest dots against the row
  * vector, best first — k-means cell assignment (p = 1) and SemDeDup's
  * multi-probe recall knob (p > 1) in one kernel. Stable first-max
  * insertion (strict `>` keeps earlier centroids ahead on ties) — identical
  * ordering to the compiled-UDF form it replaces and to the Seq overload's
  * `array_position(first max)` at p = 1.
  */
case class FloatTopDotCells(child: Expression, centroids: Array[Array[Double]],
    ids: Array[Long], p: Int) extends UnaryExpression with ExpectsInputTypes {

  require(centroids.length == ids.length, "one id per centroid")
  require(p >= 1, s"p must be >= 1 (got $p)")

  private val np = math.min(p, centroids.length)

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "float_top_dot_cells"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val bestIdx = new Array[Int](np)
    val bestDot = Array.fill(np)(Double.NegativeInfinity)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0
      var i = 0
      val n = math.min(cent.length, v.numElements())
      while (i < n) { d += cent(i) * v.getFloat(i).toDouble; i += 1 }
      var slot = np
      while (slot > 0 && d > bestDot(slot - 1)) slot -= 1
      if (slot < np) {
        var m = np - 1
        while (m > slot) { bestDot(m) = bestDot(m - 1); bestIdx(m) = bestIdx(m - 1); m -= 1 }
        bestDot(slot) = d
        bestIdx(slot) = c
      }
      c += 1
    }
    val out = new Array[Long](np)
    var m = 0
    while (m < np) { out(m) = ids(bestIdx(m)); m += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cs = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val idsRef = ctx.addReferenceObj("cellIds", ids, "long[]")
      val bestIdx = ctx.freshName("bestIdx")
      val bestDot = ctx.freshName("bestDot")
      val c = ctx.freshName("c")
      val cent = ctx.freshName("cent")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val slot = ctx.freshName("slot")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      s"""
         |int[] $bestIdx = new int[$np];
         |double[] $bestDot = new double[$np];
         |java.util.Arrays.fill($bestDot, Double.NEGATIVE_INFINITY);
         |for (int $c = 0; $c < $cs.length; $c++) {
         |  double[] $cent = $cs[$c];
         |  double $d = 0.0;
         |  int $n = java.lang.Math.min($cent.length, $a.numElements());
         |  for (int $i = 0; $i < $n; $i++) {
         |    $d += $cent[$i] * (double) $a.getFloat($i);
         |  }
         |  int $slot = $np;
         |  while ($slot > 0 && $d > $bestDot[$slot - 1]) $slot--;
         |  if ($slot < $np) {
         |    for (int $m = $np - 1; $m > $slot; $m--) {
         |      $bestDot[$m] = $bestDot[$m - 1];
         |      $bestIdx[$m] = $bestIdx[$m - 1];
         |    }
         |    $bestDot[$slot] = $d;
         |    $bestIdx[$slot] = $c;
         |  }
         |}
         |long[] $out = new long[$np];
         |for (int $m = 0; $m < $np; $m++) $out[$m] = $idsRef[$bestIdx[$m]];
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
