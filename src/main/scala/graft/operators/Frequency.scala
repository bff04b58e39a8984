package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Exact heavy hitters with bounded shuffle — the frequent-item shape a
 * training-data pipeline needs over HIGH-cardinality keys (shingles,
 * URLs, n-grams), where "explode and groupBy everything" shuffles the
 * whole key universe.
 *
 * Two passes:
 *
 *   1. candidate sketch: per-partition Misra-Gries with `k` counters
 *      (classic streaming frequent-items; undercount per partition is at
 *      most n_p/(k+1)). Only <= k candidate keys per partition ever leave
 *      the executors — shuffle volume is k x partitions, independent of
 *      key cardinality. A key absent from EVERY partition sketch has
 *      global count <= N/(k+1), so with `minCount > N/(k+1)` the
 *      candidate union provably contains every true heavy hitter
 *      (validated at runtime — the call THROWS rather than silently
 *      under-reporting when k is too small for the requested threshold).
 *   2. exact recount: one more scan counts ONLY candidate keys (semi-join
 *      against the small candidate set — AQE broadcasts it when small)
 *      and filters to `minCount`. The result is EXACT, not approximate:
 *      the sketch only bounds the candidate set, never the answer.
 *
 * The per-partition sketch is genuine imperative per-partition state —
 * the sanctioned `mapPartitions` case; everything around it stays
 * declarative.
 *
 * The reference engine has no frequency operator beyond full tag counts
 * (tags.c aggregates a bounded dictionary); this is a graft extension.
 */
object Frequency {

  /** Misra-Gries over one iterator: returns the surviving candidate keys
    * and the number of items consumed. */
  private[graft] def misraGries(it: Iterator[String], k: Int): (Seq[String], Long) = {
    val counters = mutable.HashMap.empty[String, Long]
    var n = 0L
    while (it.hasNext) {
      val w = it.next(); n += 1
      counters.get(w) match {
        case Some(c) => counters.update(w, c + 1)
        case None =>
          if (counters.size < k) counters.update(w, 1L)
          else {
            // decrement-all: each such event retires k+1 occurrences, so
            // total decrement work is O(N) across the partition
            val dead = mutable.ArrayBuffer.empty[String]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters.update(key, c - 1)
            }
            dead.foreach(counters.remove)
          }
      }
    }
    (counters.keys.toSeq, n)
  }

  /**
   * Exact counts of every key occurring at least `minCount` times in
   * `items` (ONE row per occurrence; keys are compared as strings and NULL
   * keys are ignored). Returns (keyCol, n) — the exact global counts of
   * qualifying keys.
   *
   * Requires `minCount > N/(k+1)` (N = total non-null rows) for the
   * completeness guarantee; violating it throws with the smallest
   * admissible `k`.
   */
  def heavyHitters(items: DataFrame, keyCol: String, minCount: Long,
                   k: Int = 4096): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    hh(items, keyCol, k)(_ => minCount)
  }

  /** [[heavyHitters]] with a RELATIVE threshold: keys occurring in
    * strictly more than `fracBp`/10000 of the rows (minCount resolves to
    * N*fracBp/10000 + 1 against the sketch pass's own row count — no
    * extra pre-scan for N). */
  def heavyHittersFrac(items: DataFrame, keyCol: String, fracBp: Long,
                       k: Int = 4096): DataFrame = {
    require(fracBp >= 1 && fracBp <= 10000, "fracBp must be in [1, 10000]")
    hh(items, keyCol, k)(n => n * fracBp / 10000 + 1)
  }

  private def hh(items: DataFrame, keyCol: String, k: Int)
                (minOf: Long => Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = items.sparkSession
    import spark.implicits._
    val nonNull = items.where(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as(keyCol))
    // pass 1: (candidate, isTotal=false) rows + one (null, n_p, true) row
    // per partition, so N rides along without a second scan
    val sketch = nonNull.as[String].mapPartitions { it =>
      val (cands, n) = misraGries(it, k)
      cands.iterator.map(w => (w, 0L, false)) ++ Iterator((null: String, n, true))
    }.toDF("w", "np", "is_total").persist()
    try {
      val total = sketch.where(col("is_total"))
        .agg(coalesce(sum("np"), lit(0L))).head.getLong(0)
      val minCount = minOf(total)
      require(total / (k + 1) < minCount,
        s"completeness requires minCount > N/(k+1) = $total/${k + 1}; " +
          s"raise k to at least ${total / minCount + 1} for minCount=$minCount")
      // candidates come to the driver EAGERLY (bounded by k x partitions,
      // the same bound the broadcast needs) so the sketch cache is
      // consumed before the finally-unpersist — pass 2 never re-sketches
      val cands = sketch.where(!col("is_total")).select("w").distinct()
        .as[String].collect().toSeq
      // pass 2: exact recount of candidates only (map-side semi-join)
      nonNull.join(broadcast(cands.toDF(keyCol)), keyCol)
        .groupBy(keyCol).agg(count(lit(1)).as("n"))
        .where(col("n") >= minCount)
    } finally { sketch.unpersist(); () }
  }

  /** Convenience: exact heavy WORDS of a document corpus (whitespace
    * tokens, the `wsWords` parity recipe) with count >= `minCount`. */
  def heavyWords(docs: DataFrame, minCount: Long, k: Int = 4096,
                 textCol: String = "text"): DataFrame =
    heavyHitters(
      docs.select(explode(Dedup.wsWords(col(textCol))).as("word")),
      "word", minCount, k)

  /** [[heavyWords]] with a relative threshold (see [[heavyHittersFrac]]):
    * words in strictly more than fracBp/10000 of all tokens. */
  def heavyWordsFrac(docs: DataFrame, fracBp: Long, k: Int = 4096,
                     textCol: String = "text"): DataFrame =
    heavyHittersFrac(
      docs.select(explode(Dedup.wsWords(col(textCol))).as("word")),
      "word", fracBp, k)

  /** Total whitespace-token count of a corpus (for deriving relative
    * heavy-hitter thresholds like N/50). */
  def totalWords(docs: DataFrame, textCol: String = "text"): Long =
    docs.select(coalesce(sum(size(Dedup.wsWords(col(textCol)))), lit(0L)))
      .head.getLong(0)

  /**
   * EXACT lower quantiles per group, scale-safe: the corpus collapses to
   * a (group, value) -> count histogram first (ONE aggregate with
   * map-side combine), and the rank selection windows run over that tiny
   * frame — never a per-group sort of raw rows (the corpusStats median
   * shape, generalized to arbitrary quantile lists). Reducer load is
   * bounded by a group's DISTINCT values, not its row count.
   *
   * `qBp` are quantiles in basis points (2500 = q1, 5000 = lower median,
   * 10000 = max); the lower quantile at q is the smallest value whose
   * cumulative count reaches ceil(n*q) — pure integer arithmetic, so the
   * DuckDB oracle reproduces it bit-for-bit. NULL values are excluded
   * from the ranks (engines disagree on NULL sort position, so they must
   * never enter the cumulative sums). Returns (groupCol, q_bp, q_val),
   * one row per group and quantile.
   */
  def groupQuantiles(df: DataFrame, groupCol: String, valCol: String,
                     qBp: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qBp.nonEmpty && qBp.forall(q => q >= 1 && q <= 10000),
      "quantiles must be in basis points within [1, 10000]")
    require(qBp.distinct.size == qBp.size, "duplicate quantiles")
    val byG = Window.partitionBy(groupCol)
    df.where(col(valCol).isNotNull)
      .groupBy(groupCol, valCol).agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum("_c").over(byG.orderBy(valCol)))
      .withColumn("_tot", sum("_c").over(byG))
      .withColumn("q_bp", explode(array(qBp.map(lit): _*)))
      .withColumn("_rank", expr("(_tot * q_bp + 9999) div 10000"))
      .where(col("_cum") - col("_c") < col("_rank") && col("_rank") <= col("_cum"))
      .select(col(groupCol), col("q_bp"), col(valCol).as("q_val"))
  }

  /** One (value, id) candidate for [[topKPerGroup]]; ranked by
    * (v DESC, id ASC) — a total order because ids are unique. */
  case class TopKIn(v: Long, id: Long)

  /** Bounded top-k typed Aggregator: the buffer is a SORTED list that
    * never exceeds k entries, so the partial state each map task ships
    * through the shuffle is at most k rows per group — independent of the
    * group's row count. `reduce` is a single ordered insert (O(k), k is
    * small by contract); `merge` is a sorted-merge truncated at k. */
  private class TopKAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        TopKIn, List[TopKIn], Seq[TopKIn]] {
    private def before(a: TopKIn, b: TopKIn): Boolean =
      a.v > b.v || (a.v == b.v && a.id < b.id)
    override def zero: List[TopKIn] = Nil
    override def reduce(buf: List[TopKIn], in: TopKIn): List[TopKIn] =
      merge(buf, in :: Nil)
    override def merge(a: List[TopKIn], b: List[TopKIn]): List[TopKIn] = {
      val out = List.newBuilder[TopKIn]
      var x = a; var y = b; var n = 0
      while (n < k && (x.nonEmpty || y.nonEmpty)) {
        if (y.isEmpty || (x.nonEmpty && before(x.head, y.head))) {
          out += x.head; x = x.tail
        } else { out += y.head; y = y.tail }
        n += 1
      }
      out.result()
    }
    override def finish(r: List[TopKIn]): Seq[TopKIn] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[List[TopKIn]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[TopKIn]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /**
   * EXACT per-row percentile within a group, scale-safe — the transform
   * that normalizes a quality score across languages/domains before a
   * global keep-threshold. pct_bp = floor(10000 * |{rows in group with
   * value < v}| / n) — pure integer arithmetic, so the DuckDB oracle
   * ((rank() - 1) * 10000 // n) reproduces it bit-for-bit.
   *
   * The naive formulation is a window over EVERY raw row per group (the
   * corpusStats scale-killer); here the raw rows never sort: one
   * map-side-combined histogram aggregate builds the (group, value) ->
   * count frame, the strictly-below cumulative runs over that tiny frame,
   * and the result joins back as a plain equi-join on (group, value)
   * (AQE broadcasts it when small). Rows with NULL value are dropped
   * (engines disagree on NULL rank position).
   *
   * Returns the input rows + `pct_bp` in [0, 10000).
   */
  def percentileByGroup(df: DataFrame, groupCols: Seq[String],
                        valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(groupCols.nonEmpty, "need at least one group column")
    require(!df.columns.contains("pct_bp"), "input already has pct_bp")
    val kc = groupCols.map(col)
    val byG = Window.partitionBy(kc: _*)
    val hist = df.where(col(valCol).isNotNull)
      .groupBy(kc :+ col(valCol): _*).agg(count(lit(1)).as("_c"))
      .withColumn("_lt", coalesce(sum("_c").over(byG.orderBy(valCol)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum("_c").over(byG))
      .drop("_c")
    df.where(col(valCol).isNotNull)
      .join(hist, groupCols :+ valCol)
      .withColumn("pct_bp", expr("_lt * 10000 div _n"))
      .drop("_lt", "_n")
  }

  /**
   * Top-k rows per group WITHOUT a per-group sort: the window-rank
   * formulation (`row_number() OVER (PARTITION BY g ORDER BY v DESC)`)
   * shuffles and sorts EVERY row of every group; this one aggregates with
   * a bounded-heap [[TopKAgg]] so map-side partial aggregation truncates
   * each group's contribution to k rows per map task before the shuffle.
   * At 100 TB with a hot group (one language, one domain) the window puts
   * that group's entire row set through one reducer; here the reducer
   * merges at most k rows per upstream partition.
   *
   * Answer is EXACT and identical to the window formulation: rank by
   * (`valueCol` DESC, `idCol` ASC) — a total order when ids are unique,
   * so ties cannot reorder. NULL values/ids are excluded (they cannot
   * rank). Returns groupCols + (idCol, valueCol, rnk), rnk in [1, k].
   */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   idCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 10000, "k must be in [1, 10000]")
    require(groupCols.nonEmpty, "need at least one group column")
    val topk = udaf(new TopKAgg(k))
    df.where(col(valueCol).isNotNull && col(idCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(topk(col(valueCol).cast("long"), col(idCol).cast("long")).as("_top"))
      .select(groupCols.map(col) :+ posexplode(col("_top")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("col.id").as(idCol), col("col.v").as(valueCol),
        (col("pos") + 1).cast("long").as("rnk")): _*)
  }

  /**
   * Bounded-memory per-group distinct counting (linear-counting sketch):
   * every value hashes into one of `m` md5 buckets and the op returns the
   * exact number of FILLED buckets per group — the aggregation state is
   * at most m entries per group no matter how many distinct values flow
   * through, which is the whole point at 100 TB (an exact count-distinct
   * must hold every value). The standard linear-counting estimate is the
   * downstream formula  -m * ln((m - filled) / m)  over the integer this
   * returns (kept integer so the gate is hash-stable cross-engine;
   * filled == true distinct while distinct << m).
   *
   * Scale shape: one distinct on (group, bucket) — partial hash agg
   * before the exchange, and the exchanged set is <= m rows per group —
   * then a tiny per-group count. The md5 bucket IS
   * [[Sampling.hashBucket]] (the one parity-critical recipe every DuckDB
   * oracle restates — never re-implemented). NULL values are excluded:
   * they carry no identity, and a NULL bucket would count as a phantom
   * (m+1)-th bucket, driving the ln estimate to NaN at saturation.
   */
  def distinctFilled(df: DataFrame, keys: Seq[String], value: Column,
                     m: Int, salt: String = ""): DataFrame = {
    require(m >= 1, "m must be >= 1")
    df.where(value.isNotNull)
      .select(keys.map(col) :+
        Sampling.hashBucket(value, salt, m.toLong).as("_bkt"): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("filled"))
  }
}
