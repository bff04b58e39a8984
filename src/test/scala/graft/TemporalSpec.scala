package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** Temporal joins vs a naive brute-force oracle: random keyed streams with
  * planted timestamp ties, missing matches, and tolerance cut-offs; the
  * bucketed as-of variant must be decision-identical to the window one at
  * every bucket width, and the interval join must cover both the bucketed
  * and the giant-broadcast path. */
object TemporalSpec {
  case class Probe(probe_id: Long, k: Long, t: Long)
  case class Build(build_id: Long, k: Long, t: Long, v: Long)
  case class Interval(interval_id: Long, k: Long, s_t: Long, e_t: Long)
  case class Ev(u: Long, t: Long, et: String)
}

class TemporalSpec extends SparkFunSuite {
  import spark.implicits._
  import TemporalSpec._

  private val rnd = new scala.util.Random(42)
  // small key space + coarse time grid => plenty of equal-timestamp ties
  private val probes = (0L until 400L).map(i =>
    Probe(i, rnd.nextInt(5).toLong, rnd.nextInt(50).toLong * 10L))
  private val builds = (0L until 300L).map(i =>
    Build(i, rnd.nextInt(5).toLong, rnd.nextInt(50).toLong * 10L, rnd.nextInt(1000).toLong))

  /** Naive as-of: latest build (ties -> greatest build_id) per probe. */
  private def bruteAsof(inclusive: Boolean, tol: Option[Long]): Map[Long, Option[Build]] =
    probes.map { p =>
      val cands = builds.filter(b => b.k == p.k &&
        (if (inclusive) b.t <= p.t else b.t < p.t) &&
        tol.forall(x => p.t - b.t <= x))
      p.probe_id -> (if (cands.isEmpty) None
                     else Some(cands.maxBy(b => (b.t, b.build_id))))
    }.toMap

  private def collectAsof(df: DataFrame): Map[Long, Option[(Long, Long, Long)]] =
    df.select("probe_id", "m_build_id", "m_t", "m_v").collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None
                       else Some((r.getLong(1), r.getLong(2), r.getLong(3))))
    }.toMap

  private def checkAsof(df: DataFrame, inclusive: Boolean, tol: Option[Long]): Unit = {
    val got = collectAsof(df)
    val want = bruteAsof(inclusive, tol).view
      .mapValues(_.map(b => (b.build_id, b.t, b.v))).toMap
    assert(got.size === probes.size)
    assert(got === want)
  }

  private lazy val pdf = probes.toDF()
  private lazy val bdf = builds.toDF()

  test("asofJoin matches brute force (inclusive, no tolerance)") {
    checkAsof(Temporal.asofJoin(pdf, bdf, Seq("k"), "t", "build_id", Seq("v")),
      inclusive = true, tol = None)
  }

  test("asofJoin strict mode excludes equal-timestamp builds") {
    checkAsof(Temporal.asofJoin(pdf, bdf, Seq("k"), "t", "build_id", Seq("v"),
      inclusive = false), inclusive = false, tol = None)
  }

  test("asofJoin tolerance nulls out stale matches") {
    checkAsof(Temporal.asofJoin(pdf, bdf, Seq("k"), "t", "build_id", Seq("v"),
      tolerance = Some(40L)), inclusive = true, tol = Some(40L))
  }

  test("asofJoinBucketed is decision-identical to asofJoin at every width") {
    for (width <- Seq(1L, 7L, 50L, 1000L); inc <- Seq(true, false);
         tol <- Seq(None, Some(40L))) {
      val got = collectAsof(Temporal.asofJoinBucketed(pdf, bdf, Seq("k"), "t",
        "probe_id", "build_id", Seq("v"), bucketWidth = width,
        tolerance = tol, inclusive = inc))
      val want = collectAsof(Temporal.asofJoin(pdf, bdf, Seq("k"), "t",
        "build_id", Seq("v"), tolerance = tol, inclusive = inc))
      assert(got === want, s"width=$width inclusive=$inc tol=$tol")
    }
  }

  test("asofJoin carries every probe column through") {
    val p2 = pdf.withColumn("extra", col("probe_id") * 3)
    val out = Temporal.asofJoin(p2, bdf, Seq("k"), "t", "build_id", Seq("v"))
    assert(out.columns.toSeq === Seq("probe_id", "k", "t", "extra",
      "m_build_id", "m_t", "m_v"))
    assert(out.where(col("extra") =!= col("probe_id") * 3).count() === 0)
  }

  test("asofJoin refuses reserved column names") {
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(pdf.withColumn("_t", lit(1)), bdf, Seq("k"), "t", "build_id")
    }
  }

  test("asofJoin refuses probe columns that collide with emitted m_ names") {
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(pdf.withColumn("m_v", lit(1)), bdf, Seq("k"), "t",
        "build_id", Seq("v"))
    }
  }

  test("asofJoin string build ids: ties break on natural string order, no ANSI cast") {
    // two builds at the same (k, t); "b9" > "b10" in STRING order — the
    // winner must be the string-greatest, and nothing may throw under ANSI
    val sb = Seq(("b10", 0L, 10L, 1L), ("b9", 0L, 10L, 2L))
      .toDF("build_id", "k", "t", "v")
    val sp = Seq((100L, 0L, 10L)).toDF("probe_id", "k", "t")
    val win = Temporal.asofJoin(sp, sb, Seq("k"), "t", "build_id", Seq("v"))
      .select("m_build_id").collect().map(_.getString(0)).toSeq
    assert(win === Seq("b9"))
    val winB = Temporal.asofJoinBucketed(sp, sb, Seq("k"), "t", "probe_id",
        "build_id", Seq("v"), bucketWidth = 7L)
      .select("m_build_id").collect().map(_.getString(0)).toSeq
    assert(winB === Seq("b9"))
  }

  test("sessionize refuses a pre-existing session_start column") {
    intercept[IllegalArgumentException] {
      Temporal.sessionize(pdf.withColumn("session_start", lit(1L)),
        Seq("k"), "t", "probe_id", 10L)
    }
    intercept[IllegalArgumentException] {
      Temporal.sessionizeBucketed(pdf.withColumn("session_start", lit(1L)),
        Seq("k"), "t", "probe_id", 10L)
    }
  }

  private val intervals = (0L until 200L).map { i =>
    val s = rnd.nextInt(500).toLong
    Interval(i, rnd.nextInt(5).toLong, s, s + rnd.nextInt(80).toLong)
  }

  test("intervalJoin matches brute force on both the bucketed and giant path") {
    val want = (for {
      p <- probes; iv <- intervals
      if iv.k == p.k && p.t >= iv.s_t && p.t <= iv.e_t
    } yield (p.probe_id, iv.interval_id)).toSet
    // maxSpanBuckets=3 at width 10 forces intervals spanning >30 ticks
    // through the broadcast-giant path; width 1000 puts everything in one
    // bucket; width 1 gives maximal explode
    for ((width, maxSpan) <- Seq((10L, 3), (10L, 4096), (1000L, 4096), (1L, 4096))) {
      val got = Temporal.intervalJoin(pdf, intervals.toDF(), Seq("k"), "t",
          "s_t", "e_t", bucketWidth = width, maxSpanBuckets = maxSpan)
        .select("probe_id", "interval_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"duplicates at width=$width")
      assert(got.toSet === want, s"width=$width maxSpan=$maxSpan")
    }
  }

  test("intervalJoin drops inverted intervals instead of descending-explode") {
    // an inverted giant (end << start) has span <= 0: without the guard it
    // slips past maxSpanBuckets into sequence(sb, eb), which DESCENDS
    val inv = intervals :+ Interval(999L, 0L, 5000000L, 0L)
    val want = (for {
      p <- probes; iv <- intervals
      if iv.k == p.k && p.t >= iv.s_t && p.t <= iv.e_t
    } yield (p.probe_id, iv.interval_id)).toSet
    val got = Temporal.intervalJoin(pdf, inv.toDF(), Seq("k"), "t",
        "s_t", "e_t", bucketWidth = 10L, maxSpanBuckets = 3)
      .select("probe_id", "interval_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
  }

  /** Naive sessionize: walk each key's (t, id)-sorted events; a gap > `gap`
    * opens a new session labeled by its first event's ts. */
  private def bruteSessions(gap: Long): Map[Long, Long] =
    probes.groupBy(_.k).flatMap { case (_, evs) =>
      val sorted = evs.sortBy(p => (p.t, p.probe_id))
      var start = Long.MinValue; var prev = Long.MinValue
      sorted.map { p =>
        if (prev == Long.MinValue || p.t - prev > gap) start = p.t
        prev = p.t
        p.probe_id -> start
      }
    }.toMap

  private def collectSessions(df: DataFrame): Map[Long, Long] =
    df.select("probe_id", "session_start").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("sessionize matches brute force (incl. gap=0 and equal-ts runs)") {
    for (gap <- Seq(0L, 15L, 60L, 1000L)) {
      val got = collectSessions(
        Temporal.sessionize(pdf, Seq("k"), "t", "probe_id", gap))
      assert(got === bruteSessions(gap), s"gap=$gap")
    }
  }

  test("sessionize keeps every event row and its columns") {
    val out = Temporal.sessionize(pdf, Seq("k"), "t", "probe_id", 15L)
    assert(out.columns.toSeq === Seq("probe_id", "k", "t", "session_start"))
    assert(out.count() === probes.size)
  }

  test("sessionizeBucketed is decision-identical to sessionize at every width") {
    for (width <- Seq(1L, 7L, 16L, 50L, 1000L); gap <- Seq(0L, 15L, 60L)) {
      val got = collectSessions(Temporal.sessionizeBucketed(
        pdf, Seq("k"), "t", "probe_id", gap, bucketWidth = width))
      assert(got === bruteSessions(gap), s"width=$width gap=$gap")
    }
  }

  test("bucketCol floors negatives and exact multiples") {
    val df = Seq(-21L, -20L, -1L, 0L, 1L, 19L, 20L).toDF("t")
      .select(Temporal.bucketCol(col("t"), 10L).as("b"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(-3L, -2L, -1L, 0L, 0L, 1L, 2L))
  }

  test("resampleLocf matches brute force: per-bucket max, gap-free grid, " +
       "forward fill; span guard and column collisions refused") {
    val rnd = new scala.util.Random(7)
    val obs = (0 until 2000).map { i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(400).toLong * 3 + rnd.nextInt(3),
        rnd.nextInt(1000).toLong)
    }
    val df = obs.toDF("k", "t", "v")
    val out = Temporal.resampleLocf(df, Seq("k"), col("t"), col("v"), 10L)
      .collect().map(r => ((r.getAs[Long]("k"), r.getAs[Long]("b")),
        r.getAs[Long]("v_ff"))).toMap
    // brute-force oracle
    val byKey = obs.groupBy(_._1)
    val expect = byKey.flatMap { case (k, rows) =>
      val perB = rows.groupBy(_._2 / 10).map { case (b, rs) => b -> rs.map(_._3).max }
      val (b0, b1) = (perB.keys.min, perB.keys.max)
      var lastV = 0L
      (b0 to b1).map { b =>
        lastV = perB.getOrElse(b, lastV)
        (k, b) -> lastV
      }
    }.toMap
    assert(out === expect)
    // every key's grid is dense and starts with an observed bucket
    assert(out.keySet === expect.keySet)
    intercept[Exception] {  // span guard raises (SparkRuntimeException)
      Temporal.resampleLocf(df, Seq("k"), col("t"), col("v"), 10L,
        maxSpanBuckets = 5L).collect()
    }
    intercept[IllegalArgumentException] {
      Temporal.resampleLocf(df.withColumn("v_ff", lit(1L)), Seq("k"),
        col("t"), col("v"), 10L)
    }
    intercept[IllegalArgumentException] {
      Temporal.resampleLocf(df.withColumn("_x", lit(1L)), Seq("k"),
        col("t"), col("v"), 10L)
    }
  }

  test("mergeIntervals equals a fold-based oracle (random intervals: " +
       "nesting, duplicates, touching endpoints, single points)") {
    val rnd = new scala.util.Random(515)
    val iv = (0L until 2000L).map { i =>
      val k = rnd.nextInt(8).toLong
      val s = rnd.nextInt(500).toLong
      (i, k, s, s + rnd.nextInt(20).toLong)   // len 0..19 incl. points
    }
    def oracle(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
      rows.sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((cs, ce, cn) :: t, (s, e, _)) if s <= ce =>
          (cs, math.max(ce, e), cn + 1) :: t
        case (acc, (s, e, _)) => (s, e, 1L) :: acc
      }.reverse
    val expected = iv.groupBy(_._2).flatMap { case (k, rows) =>
      oracle(rows.map(r => (r._3, r._4, r._1)))
        .map { case (s, e, n) => (k, s, e, n) }
    }.toSet
    val got = Temporal.mergeIntervals(
        iv.toDF("id", "k", "s", "e").repartition(7),
        Seq("k"), "s", "e", "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
    // inverted and NULL intervals are dropped, not merged
    val dirty = (Seq((1L, 0L, 10L, 5L)).toDF("id", "k", "s", "e")
      .unionByName(Seq((2L, 0L, Option.empty[Long], Option(3L)))
        .toDF("id", "k", "s", "e")))
    assert(Temporal.mergeIntervals(dirty, Seq("k"), "s", "e", "id")
      .count() === 0L)
    // bucketed twin: identical spans at widths from degenerate (every
    // interval its own bucket) to one-bucket-fits-all
    val df = iv.toDF("id", "k", "s", "e").repartition(7)
    for (w <- Seq(1L, 7L, 100L, 100000L)) {
      val got2 = Temporal.mergeIntervalsBucketed(df, Seq("k"), "s", "e",
          "id", bucketWidth = w)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got2 === expected, s"bucketWidth=$w")
    }
    assert(Temporal.mergeIntervalsBucketed(dirty, Seq("k"), "s", "e",
      "id", 10L).count() === 0L)
  }

  // ---- cohort retention + funnel ---------------------------------------------

  private lazy val funnelEvents: Seq[Ev] = {
    val r = new scala.util.Random(77)
    val types = Seq("signup", "view", "click", "purchase", "error")
    (0 until 3000).map { _ =>
      Ev(r.nextInt(40).toLong, r.nextInt(2000).toLong * 7L,
        types(r.nextInt(types.size)))
    }
  }

  test("cohortRetention equals the brute-force retention triangle") {
    val width = 700L
    val df = funnelEvents.toDF("u", "t", "et")
    val got = Temporal.cohortRetention(df, "u", col("t"), width).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def bkt(t: Long) = t / width    // non-negative fixture: / == floor
    val cohorts = funnelEvents.groupBy(_.u).view.mapValues(es => bkt(es.map(_.t).min))
    val expected = funnelEvents.map(e => (e.u, bkt(e.t))).distinct
      .groupBy { case (u, b) => (cohorts(u), b - cohorts(u)) }
      .view.mapValues(_.size.toLong).toMap
    assert(got == expected)
    // every user contributes an age-0 row
    assert(got.filter(_._1._2 == 0L).values.sum ==
      funnelEvents.map(_.u).distinct.size)
  }

  test("funnel counts equal the brute-force ordered-prefix chase, " +
       "monotonically non-increasing") {
    val steps = Seq("signup", "view", "click", "purchase")
    val horizon = 3000L
    val df = funnelEvents.toDF("u", "t", "et")
    val got = Temporal.funnel(df, "u", col("t"), col("et"), steps, horizon)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: per user, chase the earliest strictly-later step times
    val byUser = funnelEvents.groupBy(_.u)
    def reach(es: Seq[Ev]): Int = {
      val t1s = es.filter(_.et == steps.head).map(_.t)
      if (t1s.isEmpty) return 0
      var cur = t1s.min
      val dead = t1s.min + horizon
      var depth = 1
      steps.drop(1).foreach { st =>
        val nxt = es.filter(e => e.et == st && e.t > cur && e.t <= dead).map(_.t)
        if (nxt.nonEmpty && depth == steps.indexOf(st)) {
          cur = nxt.min; depth += 1
        }
      }
      depth
    }
    val depths = byUser.values.map(reach(_)).toSeq
    val expected = steps.indices.map(i =>
      (i + 1).toLong -> depths.count(_ >= i + 1).toLong).toMap
    assert(got == expected)
    assert(got(1L) >= got(2L) && got(2L) >= got(3L) && got(3L) >= got(4L))
    assert(got(1L) > 0L && got(4L) > 0L, "fixture must exercise every step")
  }
}
