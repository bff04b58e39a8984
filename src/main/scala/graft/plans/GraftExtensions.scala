package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions._

/**
 * Catalyst optimizer rule: collapse dequantize->requantize chains over the
 * packed coordinate. Users composing the API naively (e.g. in SQL:
 * `grid_cell(lon_of(phash), lat_of(phash))`) would otherwise pay two
 * int->double->int conversions per row; the packed-coord expressions do
 * pure bit ops.
 *
 * Soundness: quantize(dequantize(x)) == x bit-exactly for every int32 (the
 * double round-trip x*c then /c with c = 180/INT32_MAX never crosses the
 * truncation boundary) — verified EXHAUSTIVELY over all 2^32 values of both
 * axes by CellIndexSpec's "quantize inverts dequantize" sweep; the rewrite
 * itself is differential-tested in CellExpressionsSpec.
 */
object SimplifyCellExpressions extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GridCellId(LonOfPacked(p1), LatOfPacked(p2))
          if p1.semanticEquals(p2) => GridCellFromPacked(p1)
      case MortonCellId(LonOfPacked(p1), LatOfPacked(p2), res)
          if p1.semanticEquals(p2) => MortonCellFromPacked(p1, res)
      case PackCoord(LonOfPacked(p1), LatOfPacked(p2))
          if p1.semanticEquals(p2) => p1     // repack of unpack = identity
    }
}

/** `--conf spark.sql.extensions=graft.plans.GraftExtensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => SimplifyCellExpressions)
}

object GraftExtensions {
  /** Install on an already-running session (extraOptimizations is the
    * public hook for post-hoc optimizer rules). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(SimplifyCellExpressions))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SimplifyCellExpressions
}
