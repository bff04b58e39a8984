package graft.functions

import org.apache.spark.sql.Column
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
  def hyperplane_sig(c: Column, planes: Array[Array[Float]]): Column =
    col(HyperplaneSig(ex(c), planes))

  /** Deterministic Gaussian hyperplanes for LSH. */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val r = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(r.nextGaussian().toFloat))
  }
}
