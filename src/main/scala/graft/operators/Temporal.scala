package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Temporal joins over keyed event streams — the two classic shapes a
 * training-data / analytics pipeline needs beyond equi-joins:
 *
 *   - as-of join (each probe row picks the LATEST build row at-or-before
 *     its timestamp, per key) — feature lookup, point-in-time correctness;
 *   - interval (range) join (each point row joins every interval row of
 *     the same key whose [start, end] contains it) — sessionization,
 *     label windows.
 *
 * The reference engine has no temporal operators (its streams are spatial;
 * cf. the minutely-diff roadmap item, reference README.md:95-98) — these are
 * graft extensions, designed Spark-first:
 *
 *   - [[asofJoin]] is ONE shuffle on the key: both sides union into a
 *     single keyed timeline and a running `last(ignoreNulls)` window fills
 *     each probe with the preceding build payload. Exact, no per-row
 *     search; the classic union-timeline formulation, fully expressible
 *     in ANSI window SQL (so the DuckDB gate replicates it verbatim).
 *   - [[asofJoinBucketed]] is the skew-safe variant for 100 TB keys: a
 *     hot key no longer funnels through one reducer. Probes join builds
 *     only within their own time bucket (reducer load bounded by bucket
 *     population, not key population); a carry-in frame — the last build
 *     of every earlier bucket, computed over the tiny distinct
 *     (key, bucket) set — covers probes whose bucket holds no earlier
 *     build. Decision-identical to [[asofJoin]] (spec-proven).
 *   - [[intervalJoin]] explodes each interval into the time buckets it
 *     covers and equi-joins on (key, bucket) — never key-wide all-pairs.
 *     A point lives in exactly one bucket, so no post-join dedup is
 *     needed. Intervals spanning more than `maxSpanBuckets` buckets take
 *     a broadcast fallback instead of a huge explode (rare-giant guard).
 *
 * Timestamps are plain comparable numerics (epoch micros as long is the
 * convention used by the gates); bucket arithmetic assumes |ts| < 2^53
 * (epoch micros are valid until year ~2255).
 *
 * Reserved column names: callers' frames must not already use `_`-prefixed
 * names (`_t`, `_bkt`, `_m`, ...) — enforced by require.
 */
object Temporal {

  /** Floor(t / width) as an exact integer: pmod-based so negatives floor
    * (not truncate) and the division is always of an exact multiple. */
  private[graft] def bucketCol(t: Column, width: Long): Column =
    ((t - pmod(t, lit(width))) / lit(width)).cast("long")

  private def reserved(df: DataFrame, what: String): Unit =
    require(!df.columns.exists(_.startsWith("_")),
      s"$what columns must not start with '_' (reserved): ${df.columns.mkString(",")}")

  /** The payload carried from the matched build row: its id, its
    * timestamp (needed for tolerance), and the requested value columns. */
  private def matchStruct(buildId: String, ts: String, payload: Seq[String]): Column =
    struct((Seq(buildId, ts) ++ payload).map(col): _*)

  /** Shared tail: apply the optional tolerance gate and flatten the probe
    * struct + the matched payload (m_-prefixed). Expects `_probe`, `_t`,
    * `_match` on `filled`. A probe with no (in-tolerance) match keeps its
    * row with NULL m_* columns — as-of joins are left joins. */
  private def finish(filled: DataFrame, probes: DataFrame, ts: String, buildId: String,
                     payload: Seq[String], tolerance: Option[Long]): DataFrame = {
    val mNames = (Seq(buildId, ts) ++ payload).map(f => s"m_$f").toSet
    val clash = probes.columns.filter(mNames)
    require(clash.isEmpty,
      s"probe columns collide with emitted match columns: ${clash.mkString(",")}")
    val gated = tolerance match {
      case Some(tol) =>
        when(col("_match").isNotNull && (col("_t") - col("_match")(ts)) <= tol, col("_match"))
      case None => col("_match")
    }
    val mFields = Seq(buildId, ts) ++ payload
    filled.withColumn("_g", gated).select(
      probes.columns.map(c => col("_probe")(c).as(c)) ++
        mFields.map(f => col("_g")(f).as(s"m_$f")): _*)
  }

  /**
   * Backward as-of join: for each probe row, the build row of the same
   * key with the greatest `ts` at-or-before (inclusive=true) / strictly
   * before (inclusive=false) the probe's `ts`. Ties among builds at the
   * same timestamp resolve to the greatest `buildId` in the id column's
   * natural sort order (a deterministic total order). Optional
   * `tolerance`: matches older than `probe.ts - tolerance` are nulled
   * out.
   *
   * Scale shape: one shuffle, partitioned by the key columns — correct
   * and minimal for well-distributed keys. A single hot key serializes
   * through one reducer (the window needs the key's full timeline in
   * order); use [[asofJoinBucketed]] when keys are skewed.
   */
  def asofJoin(probes: DataFrame, builds: DataFrame, keys: Seq[String], ts: String,
               buildId: String, payload: Seq[String] = Nil,
               tolerance: Option[Long] = None, inclusive: Boolean = true): DataFrame = {
    reserved(probes, "probe"); reserved(builds, "build")
    val m = matchStruct(buildId, ts, payload)
    val mType = builds.select(m.as("_m")).schema("_m").dataType
    val pType = StructType(probes.schema.fields)
    // at equal ts the build must sort BEFORE the probe for inclusive
    // semantics (the running last() then sees it), AFTER for strict
    val probeSide = if (inclusive) 1 else -1
    // _seq breaks build-vs-build ties only (probes differ in _side), so the
    // id column rides in its own type — no ANSI-hazard numeric cast
    val seqType = builds.schema(buildId).dataType
    val b = builds.select(
      keys.map(col) ++ Seq(col(ts).as("_t"), lit(0).as("_side"),
        col(buildId).as("_seq"), m.as("_m"),
        lit(null).cast(pType).as("_probe")): _*)
    val p = probes.select(
      keys.map(col) ++ Seq(col(ts).as("_t"), lit(probeSide).as("_side"),
        lit(null).cast(seqType).as("_seq"), lit(null).cast(mType).as("_m"),
        struct(probes.columns.map(col): _*).as("_probe")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = b.unionByName(p)
      .withColumn("_match", last(col("_m"), ignoreNulls = true).over(w))
      .where(col("_side") === probeSide)
    finish(filled, probes, ts, buildId, payload, tolerance)
  }

  /**
   * Skew-safe as-of join (same answer as [[asofJoin]], spec-proven):
   * reducer load is bounded by time-bucket population instead of key
   * population. Three small stages replace the key-wide window:
   *
   *   1. within-bucket: probes equi-join builds on (key, bucket) and keep
   *      the per-probe argmax build at-or-before their ts;
   *   2. carry-in: the last build of each (key, bucket) — a tiny
   *      aggregate — cumulative-filled across the key's bucket list
   *      (a window over #distinct-buckets rows, not #rows);
   *   3. coalesce(within-bucket, carry-in) per probe.
   *
   * `probeId` must be unique per probe row (it keys the within-bucket
   * argmax). Pick `bucketWidth` so a bucket holds a bounded slice of a
   * hot key's rows (e.g. an hour of events).
   */
  def asofJoinBucketed(probes: DataFrame, builds: DataFrame, keys: Seq[String], ts: String,
                       probeId: String, buildId: String, payload: Seq[String] = Nil,
                       bucketWidth: Long = 3600L * 1000000L,
                       tolerance: Option[Long] = None, inclusive: Boolean = true): DataFrame = {
    reserved(probes, "probe"); reserved(builds, "build")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val m = matchStruct(buildId, ts, payload)
    val bb = builds.select(
      keys.map(col) ++ Seq(bucketCol(col(ts), bucketWidth).as("_bkt"),
        col(ts).as("_bt"), col(buildId).as("_bseq"), m.as("_m")): _*)
    val pb = probes.select(
      keys.map(col) ++ Seq(col(probeId), col(ts).as("_pt"),
        bucketCol(col(ts), bucketWidth).as("_bkt")): _*)
    val tcond = if (inclusive) col("_bt") <= col("_pt") else col("_bt") < col("_pt")
    // 1. within the probe's own bucket: argmax over (ts, buildId)
    val within = pb.join(bb, keys :+ "_bkt").where(tcond)
      .groupBy(col(probeId))
      .agg(max_by(col("_m"), struct(col("_bt"), col("_bseq"))).as("_mw"))
    // 2. carry-in from strictly earlier buckets, over the bucket frame of
    //    BOTH sides (a probe bucket holding no build still needs carry)
    val lastPerBucket = bb.groupBy(keys.map(col) :+ col("_bkt"): _*)
      .agg(max_by(col("_m"), struct(col("_bt"), col("_bseq"))).as("_lb"))
    val allBuckets = pb.select(keys.map(col) :+ col("_bkt"): _*).distinct()
      .unionByName(lastPerBucket.select(keys.map(col) :+ col("_bkt"): _*))
      .distinct()
    val wb = Window.partitionBy(keys.map(col): _*).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = allBuckets.join(lastPerBucket, keys :+ "_bkt", "left")
      .withColumn("_ci", last(col("_lb"), ignoreNulls = true).over(wb))
      .select(keys.map(col) ++ Seq(col("_bkt"), col("_ci")): _*)
    // 3. combine; builds in earlier buckets are strictly earlier in time,
    //    so inclusive/strict only matters within the bucket (handled above)
    val joined = probes
      .withColumn("_bkt", bucketCol(col(ts), bucketWidth))
      .join(within, Seq(probeId), "left")
      .join(carry, keys :+ "_bkt", "left")
      .withColumn("_match", coalesce(col("_mw"), col("_ci")))
      .withColumn("_t", col(ts))
      .withColumn("_probe", struct(probes.columns.map(col): _*))
    finish(joined, probes, ts, buildId, payload, tolerance)
  }

  /**
   * Gap-based sessionization: each event gets its session's start
   * timestamp (`session_start` — the ts of the session's first event, a
   * deterministic label that needs no global numbering). A new session
   * opens when the previous event of the same key is more than `gap`
   * behind (strictly; equal timestamps never split).
   *
   * `id` joins the ORDER BY so both engines sort ties identically; the
   * output is tie-order independent anyway (equal-ts runs share one
   * session and its start), but determinism should never hinge on that.
   *
   * Scale shape: one shuffle + one key-partitioned window (the classic
   * formulation — lag flag + running last of flagged ts, both inside a
   * single Window exec). A hot key serializes through one reducer; use
   * [[sessionizeBucketed]] for skewed keys.
   */
  def sessionize(events: DataFrame, keys: Seq[String], ts: String, id: String,
                 gap: Long): DataFrame = {
    reserved(events, "event")
    require(!events.columns.contains("session_start"),
      "event columns must not already contain session_start (the emitted label)")
    require(gap >= 0, "gap must be non-negative")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts), col(id))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev", lag(col(ts), 1).over(w))
      .withColumn("_st", when(col("_prev").isNull || col(ts) - col("_prev") > gap, col(ts)))
      .withColumn("session_start", last(col("_st"), ignoreNulls = true).over(run))
      .drop("_prev", "_st")
  }

  /**
   * Skew-safe sessionization (same answer as [[sessionize]], spec-proven
   * at every bucket width): reducer load bounded by time-bucket
   * population. Buckets partition time, so everything crossing a bucket
   * boundary reduces to two running maxima over the tiny distinct
   * (key, bucket) frame:
   *
   *   - carry-prev: a bucket-first event's predecessor is the max ts of
   *     all earlier buckets (a running max — ts are bucket-monotone);
   *   - carry-start: an event before its bucket's first session flag
   *     inherits the latest flagged ts of earlier buckets (running max of
   *     per-bucket last flags — also bucket-monotone).
   *
   * Within a bucket the lag/flag/running-last trio is windowed on
   * (key, bucket) — never the bare key.
   */
  def sessionizeBucketed(events: DataFrame, keys: Seq[String], ts: String, id: String,
                         gap: Long, bucketWidth: Long = 3600L * 1000000L): DataFrame = {
    reserved(events, "event")
    require(!events.columns.contains("session_start"),
      "event columns must not already contain session_start (the emitted label)")
    require(gap >= 0, "gap must be non-negative")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val eb = events.withColumn("_bkt", bucketCol(col(ts), bucketWidth))
    val wseq = Window.partitionBy(keys.map(col): _*).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wwin = Window.partitionBy((keys :+ "_bkt").map(col): _*).orderBy(col(ts), col(id))
    val run = wwin.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry-prev over the (key, bucket) frame: max ts of earlier buckets
    val carryPrev = eb.groupBy((keys :+ "_bkt").map(col): _*)
      .agg(max(col(ts)).as("_maxts"))
      .withColumn("_cprev", max(col("_maxts")).over(wseq))
      .select((keys :+ "_bkt").map(col) :+ col("_cprev"): _*)
    val flagged = eb.join(carryPrev, keys :+ "_bkt")
      .withColumn("_prev", coalesce(lag(col(ts), 1).over(wwin), col("_cprev")))
      .withColumn("_st", when(col("_prev").isNull || col(ts) - col("_prev") > gap, col(ts)))
      .withColumn("_wst", last(col("_st"), ignoreNulls = true).over(run))
    // carry-start over the same tiny frame: latest flagged ts so far
    val carrySt = flagged.groupBy((keys :+ "_bkt").map(col): _*)
      .agg(max(col("_st")).as("_lastst"))
      .withColumn("_cst", max(col("_lastst")).over(wseq))
      .select((keys :+ "_bkt").map(col) :+ col("_cst"): _*)
    flagged.join(carrySt, keys :+ "_bkt")
      .withColumn("session_start", coalesce(col("_wst"), col("_cst")))
      .select(events.columns.map(col) :+ col("session_start"): _*)
  }

  /**
   * Keyed interval (range) join: every (point, interval) pair of the same
   * key with `start <= ts <= end`. Output = point columns + interval
   * columns (callers keep the non-key names disjoint).
   *
   * Scale shape: intervals explode into the time buckets they cover and
   * the join is an equi-join on (key, bucket) — candidate volume is
   * bounded by bucket co-occupancy, never |points per key| x |intervals
   * per key|. A point lives in exactly one bucket so no dedup pass is
   * needed. Intervals spanning more than `maxSpanBuckets` buckets (rare
   * giants that would explode wide) instead broadcast into a residual
   * non-equi join.
   */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String], ts: String,
                   start: String, end: String, bucketWidth: Long = 3600L * 1000000L,
                   maxSpanBuckets: Int = 4096): DataFrame = {
    reserved(points, "point"); reserved(intervals, "interval")
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxSpanBuckets >= 1, "maxSpanBuckets must be >= 1")
    val sb = bucketCol(col(start), bucketWidth)
    val eb = bucketCol(col(end), bucketWidth)
    val span = eb - sb + lit(1L)
    val pb = points.withColumn("_bkt", bucketCol(col(ts), bucketWidth))
    val cond = col(ts) >= col(start) && col(ts) <= col(end)
    // inverted intervals (end < start) can never contain a point, and a
    // negative span would slip past the giant guard into a DESCENDING
    // sequence() explode (sequence(1, 0) descends) — drop them up front
    val ivs = intervals.where(col(end) >= col(start))
    val bucketed = pb
      .join(ivs.where(span <= maxSpanBuckets)
              .withColumn("_bkt", explode(sequence(sb, eb))),
            keys :+ "_bkt")
      .where(cond)
      .drop("_bkt")
    val giants = points.join(broadcast(ivs.where(span > maxSpanBuckets)), keys)
      .where(cond)
    bucketed.unionByName(giants)
  }

  /** Time-series RESAMPLE + forward fill (last observation carried
    * forward): per key, aggregate observations into fixed `stepMicros`
    * buckets (bucket value = MAX over the bucket — deterministic under
    * duplicate timestamps), emit every bucket from the key's first to its
    * last observation, and fill empty buckets with the most recent earlier
    * bucket's value. The regular-grid feature-table step of a time-series
    * training pipeline.
    *
    * Output: (key columns, `b` bucket index, `v_ff` filled value). The
    * first bucket per key always has an observation, so `v_ff` is never
    * NULL.
    *
    * Scale shape: one partial+final hash aggregate builds the per-(key,
    * bucket) maxima; the gap explode is a bounded `sequence` over the
    * key's own bucket span; the LOCF window partitions BY KEY — reducer
    * load is one key's grid, which for real per-entity series is bounded
    * by timespan/step, never by corpus size. Keys whose grid would exceed
    * `maxSpanBuckets` fail loudly rather than exploding silently. */
  def resampleLocf(df: DataFrame, keys: Seq[String], tsMicros: Column,
                   value: Column, stepMicros: Long,
                   maxSpanBuckets: Long = 1000000L): DataFrame = {
    require(stepMicros > 0, "stepMicros must be positive")
    require(keys.nonEmpty, "at least one key column")
    reserved(df, "resampleLocf")
    require(!df.columns.exists(Seq("b", "v_ff").contains),
      "input must not contain output columns b/v_ff")
    val kc = keys.map(col)
    val obs = df
      .withColumn("_v", value.cast("long"))
      .withColumn("b", bucketCol(tsMicros, stepMicros))
    val perBucket = obs.groupBy(kc :+ col("b"): _*).agg(max("_v").as("_bv"))
    // the span guard lives INSIDE the sequence bound (a free-standing
    // guard column would be pruned away as unused by Catalyst)
    val hi = when(col("_b1") - col("_b0") >= maxSpanBuckets,
      raise_error(concat(lit("resampleLocf: key grid exceeds "),
        lit(maxSpanBuckets), lit(" buckets"))).cast("long"))
      .otherwise(col("_b1"))
    val span = perBucket.groupBy(kc: _*)
      .agg(min("b").as("_b0"), max("b").as("_b1"))
      .withColumn("b", explode(sequence(col("_b0"), hi)))
      .drop("_b0", "_b1")
    span.join(perBucket, keys :+ "b", "left")
      .withColumn("v_ff", last("_bv", ignoreNulls = true).over(
        Window.partitionBy(kc: _*).orderBy("b")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_bv")
  }

  /**
   * Merge overlapping-or-touching CLOSED intervals per key into disjoint
   * coverage spans — the "what time ranges do we actually have data for"
   * question (ingest coverage, snapshot validity, sensor uptime).
   *
   * One key-partitioned window ordered by (start, end, id) — a TOTAL
   * order, so the ROWS-frame running max is deterministic and the DuckDB
   * oracle reproduces the spans bit-for-bit (ordering by start alone
   * would make the 1-PRECEDING frame tie-dependent). An interval starts a
   * new span iff its start exceeds the running max end of everything
   * before it; the span id is the running count of such starts. Reducer
   * load is one key's intervals (the sessionize shape; if a single key's
   * interval count is itself the skew, the sessionizeBucketed carry
   * scaffold applies — not duplicated here).
   *
   * Returns one row per span: keys + (span_start, span_end, n_intervals).
   * NULL starts/ends are dropped (they order differently across engines).
   *
   * @param id a UNIQUE tiebreak column (ids make the order total).
   */
  def mergeIntervals(df: DataFrame, keys: Seq[String], start: String,
                     end: String, id: String): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    reserved(df, "mergeIntervals")
    val kc = keys.map(col)
    val order = Window.partitionBy(kc: _*)
      .orderBy(col(start), col(end), col(id))
    val prevMax = max(col(end)).over(
      order.rowsBetween(Window.unboundedPreceding, -1))
    df.where(col(start).isNotNull && col(end).isNotNull)
      .where(col(start) <= col(end))
      .withColumn("_new", when(prevMax.isNull || col(start) > prevMax, 1L)
        .otherwise(0L))
      .withColumn("_span", sum("_new").over(
        order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(kc :+ col("_span"): _*)
      .agg(min(start).as("span_start"), max(end).as("span_end"),
        count(lit(1)).as("n_intervals"))
      .drop("_span")
  }

  /**
   * Skew-safe [[mergeIntervals]]: decision-identical by contract (spans
   * are the connected components of a union of closed intervals — a
   * set-theoretic notion, so hierarchical merging cannot change them).
   *
   * The raw rows window ONLY on (key, start-bucket): each bucket merges
   * its own intervals locally, then the cross-bucket pass windows over
   * the LOCAL-SPAN frame — a hot key whose intervals pile up (the skew
   * case: dense coverage) collapses each bucket to few spans, so its
   * raw rows never serialize through one reducer. Worst case (every
   * interval isolated) degrades to the local-span count, never below
   * the windowed formulation.
   *
   * Local spans in different buckets have starts in disjoint bucket
   * ranges, and within a bucket they are disjoint — so the cross-bucket
   * order by span start is total without an id tiebreak.
   */
  def mergeIntervalsBucketed(df: DataFrame, keys: Seq[String], start: String,
                             end: String, id: String,
                             bucketWidth: Long): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(bucketWidth > 0, "bucketWidth must be positive")
    reserved(df, "mergeIntervalsBucketed")
    val kc = keys.map(col)
    val localOrd = Window.partitionBy(kc :+ col("_bkt"): _*)
      .orderBy(col(start), col(end), col(id))
    val localPrevMax = max(col(end)).over(
      localOrd.rowsBetween(Window.unboundedPreceding, -1))
    val locals = df.where(col(start).isNotNull && col(end).isNotNull)
      .where(col(start) <= col(end))
      .withColumn("_bkt", bucketCol(col(start), bucketWidth))
      .withColumn("_new",
        when(localPrevMax.isNull || col(start) > localPrevMax, 1L)
          .otherwise(0L))
      .withColumn("_ls", sum("_new").over(
        localOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(kc ++ Seq(col("_bkt"), col("_ls")): _*)
      .agg(min(start).as("_s"), max(end).as("_e"), count(lit(1)).as("_n"))
    val spanOrd = Window.partitionBy(kc: _*)
      .orderBy(col("_s"), col("_e"), col("_bkt"))
    val globalPrevMax = max(col("_e")).over(
      spanOrd.rowsBetween(Window.unboundedPreceding, -1))
    locals
      .withColumn("_gnew",
        when(globalPrevMax.isNull || col("_s") > globalPrevMax, 1L)
          .otherwise(0L))
      .withColumn("_gs", sum("_gnew").over(
        spanOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(kc :+ col("_gs"): _*)
      .agg(min("_s").as("span_start"), max("_e").as("span_end"),
        sum("_n").as("n_intervals"))
      .drop("_gs")
  }

  /**
   * Cohort retention: every user is assigned to the time bucket of their
   * FIRST event (the cohort); each output row counts the cohort's
   * distinct users still active `age` buckets later — the classic
   * growth-analytics retention triangle.
   *
   * Scale shape: two hash aggs keyed on the user id (first-event bucket;
   * distinct (user, bucket) activity) that co-partition, one join on the
   * user id, and a final agg on the tiny (cohort, age) pair. No window,
   * no sort — reducer load is one user's rows at worst, and a user's
   * event count is humanly bounded. Timestamps must be non-negative
   * (epoch micros convention).
   */
  def cohortRetention(events: DataFrame, user: String, tsMicros: Column,
                      width: Long): DataFrame = {
    require(width > 0, "width must be > 0")
    reserved(events, "events")
    val e = events.select(col(user).as("_u"), tsMicros.cast("long").as("_t"))
      .withColumn("_bkt", bucketCol(col("_t"), width))
    val cohorts = e.groupBy("_u").agg(min("_bkt").as("_cohort"))
    val activity = e.select("_u", "_bkt").distinct()
    activity.join(cohorts, Seq("_u"))
      .groupBy(col("_cohort").as("cohort"),
        (col("_bkt") - col("_cohort")).as("age"))
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * Ordered funnel: how many users complete each prefix of `steps`, where
   * step i must happen STRICTLY after the user's earliest completion of
   * step i-1 and within `horizon` of their step-1 time. Returns
   * (step 1-based, users).
   *
   * Scale shape: a chain of filtered aggregates — stage i is one hash agg
   * of the step-i events keyed on the user joined to the (shrinking)
   * stage i-1 user frame; no window, no collect_list of a user's whole
   * history. The per-stage frames are one row per surviving user, so
   * every join after stage 1 is against a frame no larger than the
   * step-1 user count.
   */
  def funnel(events: DataFrame, user: String, tsMicros: Column,
             typeCol: Column, steps: Seq[String], horizon: Long): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(horizon > 0, "horizon must be > 0")
    reserved(events, "events")
    val e = events.select(col(user).as("_u"), tsMicros.cast("long").as("_t"),
      typeCol.as("_et"))
    val s1 = e.where(col("_et") === steps.head)
      .groupBy("_u").agg(min("_t").as("_t1"))
    val stages = steps.indices.drop(1).scanLeft(s1) { (prev, i) =>
      e.where(col("_et") === steps(i))
        .join(prev, Seq("_u"))
        .where(col("_t") > col(s"_t${i}") &&
          col("_t") <= col("_t1") + lit(horizon))
        .groupBy("_u").agg(min("_t1").as("_t1"), min("_t").as(s"_t${i + 1}"))
    }
    stages.zipWithIndex.map { case (st, i) =>
      st.agg(count(lit(1)).as("users"))
        .select(lit(i + 1L).as("step"), col("users"))
    }.reduce(_.unionByName(_))
  }
}
