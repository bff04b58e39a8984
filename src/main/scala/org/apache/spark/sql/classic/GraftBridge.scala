package org.apache.spark.sql.classic

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.storage.StorageLevel

/** Minimal accessor for the package-private Column <-> Expression bridge
  * (Spark 4 moved the conversions into the classic package). */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly materialize a DataFrame into persisted storage and return
    * BOTH the persisted-plan frame and the backing RDD handle.
    * `Dataset.localCheckpoint(eager = true)` exposes no handle: its blocks
    * respond to neither `Dataset.unpersist` (the CacheManager does not
    * track checkpoint RDDs) nor any deterministic release — only the
    * GC-driven ContextCleaner frees them eventually. Iterative operators
    * (connected components) need per-round release NOW, not at the next
    * GC: `handle.unpersist(blocking)` is that release. */
  def persistedCopy(df: DataFrame,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : (DataFrame, RDD[InternalRow]) = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy()).persist(level)
    rdd.count()   // eager: materialized here, plan truncated below
    (ds.sparkSession.internalCreateDataFrame(rdd, ds.schema), rdd)
  }
}
