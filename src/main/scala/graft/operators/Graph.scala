package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics beyond the near-dup clustering tier
 * ([[Dedup.connectedComponents]]): fixed-iteration PageRank in EXACT
 * integer arithmetic.
 *
 * Floating-point PageRank is engine-order-dependent (double sums differ
 * by reduction order), so this implementation keeps every quantity a
 * positive integer: ranks start at `scale` per node, a node's
 * contribution is `rank div outdeg` (truncating), and the damped update
 * is `scale*15/100 + (85 * sum) div 100` — bit-identical across engines
 * and across partitionings, hence fully oracle-checkable (the DuckDB twin
 * unrolls the same iterations as CTEs). Dangling nodes (no out-edges)
 * leak their mass, the documented rule on both sides.
 *
 * Scale shape: one shuffle per iteration (contributions aggregate on
 * `dst` with map-side partial sums — a high-in-degree hub combines
 * before the exchange); the edge->degree join is computed once outside
 * the loop and reused by every iteration. The reference engine has no
 * graph operators; this is a graft extension.
 */
object Graph {

  /**
   * `iters` rounds of damped (d = 0.85) integer PageRank over
   * `nodes(id)` / `edges(src, dst)`. Returns (id, r) with
   * r = scale*15/100 + (85 * sum_{u->v} (r_u div outdeg_u)) div 100
   * per round, starting from r = `scale` everywhere.
   */
  def pageRankInt(nodes: DataFrame, edges: DataFrame, iters: Int = 3,
                  scale: Long = 1000000000L): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(scale >= 100, "scale must be >= 100 (the damped base is scale*15/100)")
    // ANSI overflow headroom: a hub's summed contribution is bounded by
    // the total mass V*scale (mass never increases), and the update
    // multiplies by 85 — keep 100x margin so 85 * sum stays in Long
    val v = nodes.count()
    require(v == 0 || scale <= Long.MaxValue / 100 / v,
      s"V*scale headroom exceeded (V=$v): pass scale <= ${Long.MaxValue / 100 / math.max(v, 1)}")
    // degree rides on each edge once; every iteration reuses this frame
    val deg = edges.groupBy("src").agg(count(lit(1)).as("_d"))
    val e = edges.join(deg, "src").select(col("src"), col("dst"), col("_d"))
    var ranks = nodes.select(col("id"), lit(scale).as("r"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("r div _d").as("_c"))
        .groupBy("id").agg(sum(col("_c")).as("_c"))
      ranks = nodes.select(col("id"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(scale * 15 / 100) + expr("(85 * coalesce(_c, 0L)) div 100")).as("r"))
    }
    ranks
  }
}
