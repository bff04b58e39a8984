package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality census — the first thing a pipeline runs against a new
 * delivery: per-column non-null and EXACT distinct counts plus the row
 * total, in one declarative aggregate (Catalyst plans multi-column
 * count(DISTINCT) as expand + partial aggregation — no per-column scans,
 * no driver loops). Exact by policy, like every other gate surface:
 * approx_count_distinct is cheaper at 100 TB but not oracle-checkable;
 * callers who want the sketch can use the built-in directly.
 */
object Profile {

  /** Long-format census of `cols`: one row per column with (col_name,
    * n_rows, n_nonnull, n_distinct). Distinct counts ignore NULLs (SQL
    * count(DISTINCT) semantics). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    require(cols.forall(df.columns.contains), s"unknown columns: " +
      cols.filterNot(df.columns.contains).mkString(","))
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        count(col(c)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col("n_rows"),
        col(s"_nn_$c").as("n_nonnull"), col(s"_nd_$c").as("n_distinct"))): _*))
      .as("_p")).select("_p.*")
  }
}
