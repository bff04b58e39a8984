package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types._

/**
 * Codegen vector expressions over `array<float>` embedding columns — the
 * hot path of similarity search. A Scala UDF here would box every float;
 * these loop over the columnar ArrayData directly inside whole-stage
 * codegen.
 */

/** Cosine similarity between the column and a query vector literal (the
  * query's norm is folded in at plan time). */
case class CosineToVec(child: Expression, vec: Array[Float])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_to_vec"
  private lazy val qNorm: Double = math.sqrt(vec.map(v => v.toDouble * v).sum)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var dot = 0.0; var n = 0.0
    var i = 0
    val len = math.min(arr.numElements(), vec.length)
    while (i < len) {
      val v = arr.getFloat(i)
      dot += v * vec(i); n += v.toDouble * v
      i += 1
    }
    dot / (math.sqrt(n) * qNorm + 1e-12)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val q = ctx.addReferenceObj("qvec", vec, "float[]")
      val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      val n = ctx.freshName("n"); val len = ctx.freshName("len")
      s"""
         |double $dot = 0.0; double $n = 0.0;
         |int $len = Math.min($arr.numElements(), $q.length);
         |for (int $i = 0; $i < $len; $i++) {
         |  float v = $arr.getFloat($i);
         |  $dot += v * $q[$i]; $n += (double) v * v;
         |}
         |${ev.value} = $dot / (Math.sqrt($n) * ${qNorm}D + 1e-12);
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def equals(o: Any): Boolean = o match {
    case e: CosineToVec => e.child == child && java.util.Arrays.equals(e.vec, vec)
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + java.util.Arrays.hashCode(vec)
}

/** Cosine similarity between two array<float> columns (pair verification). */
case class CosineCols(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_cols"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    val len = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < len) {
      val xv = x.getFloat(i); val yv = y.getFloat(i)
      dot += xv * yv; nx += xv.toDouble * xv; ny += yv.toDouble * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny) + 1e-12)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val len = ctx.freshName("len")
      s"""
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |int $len = Math.min($x.numElements(), $y.numElements());
         |for (int $i = 0; $i < $len; $i++) {
         |  float xv = $x.getFloat($i); float yv = $y.getFloat($i);
         |  $dot += xv * yv; $nx += (double) xv * xv; $ny += (double) yv * yv;
         |}
         |${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny) + 1e-12);
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Exact integer squared-L2 argmin of a quantized `array<long>` column
  * against CONSTANT integer centroids (the portable-k-means assignment
  * hot loop): returns struct(cluster, d2) with first-minimum ties —
  * bit-identical to the higher-order
  * `transform(centsLit, c -> aggregate(zip_with(q, c, ...), 0L, +))` +
  * `array_position(d, array_min(d))` formulation it replaces, including
  * the null semantics (NULL result iff the vector's length differs from
  * the centroid dim or any element is NULL — exactly when zip_with's
  * null-padding/propagation nulled every distance) and ANSI overflow
  * behavior (exact arithmetic throws, never wraps). Centroids ride as a
  * REFERENCE OBJECT, so the generated source is independent of their
  * VALUES: plan size is O(1) in k x dim and the compiled class is
  * reused across Lloyd iterations (no per-iteration janino compile). */
case class QDistArgmin(child: Expression, cents: Array[Array[Long]])
    extends UnaryExpression {
  require(cents.nonEmpty && cents.forall(_.length == cents(0).length),
    "need >= 1 centroids of equal dim")
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("d2", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "qdist_argmin"
  // the eval/codegen loops read elements with getLong: reject any other
  // element type at ANALYSIS time (ExpectsInputTypes is private[sql] in
  // Spark 4, so the guard is a direct checkInputDataTypes override) —
  // an unguarded getLong over e.g. array<int> would read garbage
  // silently on the columnar path
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val dim = cents(0).length
    if (q.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (q.isNullAt(i)) return null; i += 1 }
    var best = Long.MaxValue; var bestC = -1L
    var c = 0
    while (c < cents.length) {
      val cv = cents(c); var d = 0L; var j = 0
      while (j < dim) {
        val t = Math.subtractExact(q.getLong(j), cv(j))
        d = Math.addExact(d, Math.multiplyExact(t, t))
        j += 1
      }
      if (d < best) { best = d; bestC = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestC, best))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val cc = ctx.addReferenceObj("cents", cents, "long[][]")
      val dim = ctx.freshName("dim"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val t = ctx.freshName("t")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val bad = ctx.freshName("bad")
      s"""
         |int $dim = $cc[0].length;
         |boolean $bad = ($q.numElements() != $dim);
         |if (!$bad) {
         |  for (int $i = 0; $i < $dim; $i++)
         |    if ($q.isNullAt($i)) { $bad = true; break; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $best = Long.MAX_VALUE; long $bestC = -1L;
         |  for (int $c = 0; $c < $cc.length; $c++) {
         |    long $d = 0L;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      long $t = Math.subtractExact($q.getLong($j), $cc[$c][$j]);
         |      $d = Math.addExact($d, Math.multiplyExact($t, $t));
         |    }
         |    if ($d < $best) { $best = $d; $bestC = $c; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ java.lang.Long.valueOf($bestC), java.lang.Long.valueOf($best) });
         |}
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def equals(o: Any): Boolean = o match {
    case e: QDistArgmin => e.child == child &&
      e.cents.length == cents.length &&
      e.cents.indices.forall(i => java.util.Arrays.equals(e.cents(i), cents(i)))
    case _ => false
  }
  override def hashCode(): Int =
    child.hashCode() * 31 + java.util.Arrays.deepHashCode(
      cents.asInstanceOf[Array[AnyRef]])
}

/** Exact integer squared-L2 between two `array<long>` columns (the
  * SemDeDup pair-verification hot loop) — bit-identical to
  * `aggregate(zip_with(a, b, (x,y)->(x-y)*(x-y)), 0L, +)` including null
  * semantics (NULL iff lengths differ — zip_with pads the shorter side
  * with nulls — or any element is NULL) and ANSI overflow (exact ops). */
case class SqDistLongCols(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sqdist_long_cols"
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got ${l.sql} / ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val len = x.numElements()
    if (y.numElements() != len) return null
    var i = 0
    while (i < len) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      i += 1
    }
    var d = 0L; i = 0
    while (i < len) {
      val t = Math.subtractExact(x.getLong(i), y.getLong(i))
      d = Math.addExact(d, Math.multiplyExact(t, t))
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val len = ctx.freshName("len"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val t = ctx.freshName("t")
      val bad = ctx.freshName("bad")
      s"""
         |int $len = $x.numElements();
         |boolean $bad = ($y.numElements() != $len);
         |if (!$bad) {
         |  for (int $i = 0; $i < $len; $i++)
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $d = 0L;
         |  for (int $i = 0; $i < $len; $i++) {
         |    long $t = Math.subtractExact($x.getLong($i), $y.getLong($i));
         |    $d = Math.addExact($d, Math.multiplyExact($t, $t));
         |  }
         |  ${ev.value} = $d;
         |}
         |""".stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** PQ subspace encode (the [[graft.operators.Similarity.pqEncode]] hot
  * loop): squared-L2 argmin of `embedding[offset, offset+subDim)` against
  * a CONSTANT per-subspace codebook, as one tight JIT'd double loop with
  * the codebook as a codegen reference object. Bit-identical to the
  * higher-order
  * `transform(cbLit, cw -> aggregate(zip_with(slice(emb,...), cw,
  * (x,y)->(x-y)*(x-y)), 0.0, +))` + `array_position(d, array_min(d))`
  * form it replaces:
  *  - each float element promotes to double before the subtract, and the
  *    per-codeword sum is the same ascending-dim left fold — the doubles
  *    are equal bit for bit;
  *  - NULL result iff the vector is NULL, too short to fill the slice
  *    (zip_with null-pads the short side, nulling every distance), or
  *    any slice element is NULL — exactly the cases where the
  *    higher-order form nulled all distances and array_position(x, NULL)
  *    returned NULL;
  *  - ties and NaN follow Spark's total order for doubles
  *    (java.lang.Double.compare: NaN greatest, first minimum wins),
  *    which is precisely array_min + first-match array_position. */
case class PqSubArgmin(child: Expression, cb: Array[Array[Double]],
                       offset: Int)
    extends UnaryExpression {
  require(cb.nonEmpty && cb.forall(_.length == cb(0).length),
    "need >= 1 codewords of equal dim")
  require(offset >= 0, "offset must be >= 0")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_sub_argmin"
  // the loops read with getFloat: an array<double> input would silently
  // yield garbage codes on the columnar path (the higher-order reference
  // form handled any numeric array) — reject at analysis time instead
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val subDim = cb(0).length
    if (q.numElements() < offset + subDim) return null
    var j = 0
    while (j < subDim) { if (q.isNullAt(offset + j)) return null; j += 1 }
    var best = 0.0; var bestC = -1
    var c = 0
    while (c < cb.length) {
      val cw = cb(c); var d = 0.0; var i = 0
      while (i < subDim) {
        val t = q.getFloat(offset + i).toDouble - cw(i)
        d += t * t
        i += 1
      }
      if (bestC < 0 || java.lang.Double.compare(d, best) < 0) {
        best = d; bestC = c
      }
      c += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val cc = ctx.addReferenceObj("cb", cb, "double[][]")
      val subDim = ctx.freshName("subDim"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val t = ctx.freshName("t")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val bad = ctx.freshName("bad")
      s"""
         |int $subDim = $cc[0].length;
         |boolean $bad = ($q.numElements() < $offset + $subDim);
         |if (!$bad) {
         |  for (int $j = 0; $j < $subDim; $j++)
         |    if ($q.isNullAt($offset + $j)) { $bad = true; break; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = 0.0; int $bestC = -1;
         |  for (int $c = 0; $c < $cc.length; $c++) {
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      double $t = (double) $q.getFloat($offset + $i) - $cc[$c][$i];
         |      $d += $t * $t;
         |    }
         |    if ($bestC < 0 || java.lang.Double.compare($d, $best) < 0) {
         |      $best = $d; $bestC = $c;
         |    }
         |  }
         |  ${ev.value} = $bestC;
         |}
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def equals(o: Any): Boolean = o match {
    case e: PqSubArgmin => e.child == child && e.offset == offset &&
      e.cb.length == cb.length &&
      e.cb.indices.forall(i => java.util.Arrays.equals(e.cb(i), cb(i)))
    case _ => false
  }
  override def hashCode(): Int =
    (child.hashCode() * 31 + offset) * 31 +
      java.util.Arrays.deepHashCode(cb.asInstanceOf[Array[AnyRef]])
}

/** Random-hyperplane LSH signature: bit i = sign(dot(v, plane_i)), packed
  * into a long (up to 64 planes). Planes ride along as a reference object. */
case class HyperplaneSig(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression {
  require(planes.length <= 64)
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var dot = 0.0
      val len = math.min(arr.numElements(), p.length)
      var i = 0
      while (i < len) { dot += arr.getFloat(i) * p(i); i += 1 }
      if (dot > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val p = ctx.addReferenceObj("planes", planes, "float[][]")
      val b = ctx.freshName("b"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val sig = ctx.freshName("sig")
      s"""
         |long $sig = 0L;
         |for (int $b = 0; $b < $p.length; $b++) {
         |  double $dot = 0.0;
         |  int len = Math.min($arr.numElements(), $p[$b].length);
         |  for (int $i = 0; $i < len; $i++) $dot += $arr.getFloat($i) * $p[$b][$i];
         |  if ($dot > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def equals(o: Any): Boolean = o match {
    case e: HyperplaneSig => e.child == child && e.planes.length == planes.length &&
      e.planes.indices.forall(i => java.util.Arrays.equals(e.planes(i), planes(i)))
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + planes.length
}

object vec {
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  def cosine_to(c: Column, q: Array[Float]): Column = col(CosineToVec(ex(c), q))
  def cosine(a: Column, b: Column): Column = col(CosineCols(ex(a), ex(b)))
  def qdist_argmin(c: Column, cents: Array[Array[Long]]): Column =
    col(QDistArgmin(ex(c), cents))
  def sqdist_long(a: Column, b: Column): Column =
    col(SqDistLongCols(ex(a), ex(b)))
  def pq_sub_argmin(c: Column, cb: Array[Array[Double]], offset: Int): Column =
    col(PqSubArgmin(ex(c), cb, offset))
  def hyperplane_sig(c: Column, planes: Array[Array[Float]]): Column =
    col(HyperplaneSig(ex(c), planes))

  /** Deterministic Gaussian hyperplanes for LSH. */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val r = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(r.nextGaussian().toFloat))
  }
}
