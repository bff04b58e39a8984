package graft

import org.apache.spark.sql.functions._

import graft.operators.Frequency

/** Exact heavy hitters vs brute force on HIGH-cardinality skewed streams —
  * the shape the Misra-Gries candidate pass exists for (the oracle gate's
  * 31-word corpus can't stress it). */
class FrequencySpec extends SparkFunSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  // 12 planted heavies (Zipf-ish weights) buried in 30k near-unique keys
  private val heavies = (0 until 12).map(i => s"hot_$i" -> (2000 - 150 * i))
  private val stream: Seq[String] = rnd.shuffle(
    heavies.flatMap { case (w, n) => Seq.fill(n)(w) } ++
      (0 until 30000).map(i => s"rare_${i % 27001}"))

  private def brute(minCount: Long): Map[String, Long] =
    stream.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minCount).toMap

  test("misraGries candidates contain every key above n/(k+1)") {
    for (k <- Seq(16, 64, 256)) {
      val (cands, n) = Frequency.misraGries(stream.iterator, k)
      assert(n === stream.size)
      assert(cands.size <= k)
      val mustHave = brute(n / (k + 1) + 1).keySet
      assert(mustHave.subsetOf(cands.toSet),
        s"k=$k missing ${mustHave -- cands.toSet}")
    }
  }

  test("heavyHitters is EXACT vs brute force across k and partitioning") {
    val df = stream.toDF("w")
    for (k <- Seq(256, 512); parts <- Seq(1, 7)) {
      val minCount = 300L
      val got = Frequency.heavyHitters(df.repartition(parts), "w", minCount, k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === brute(minCount), s"k=$k parts=$parts")
    }
  }

  test("heavyHitters throws when k is too small for the threshold") {
    val e = intercept[IllegalArgumentException] {
      Frequency.heavyHitters(stream.toDF("w"), "w", minCount = 2L, k = 16)
    }
    assert(e.getMessage.contains("raise k"))
  }

  test("heavyHittersFrac == fixed-threshold twin; empty and null inputs") {
    // fracBp 100 over 44100 rows -> minCount 442
    val viaFrac = Frequency.heavyHittersFrac(stream.toDF("w"), "w", 100L, k = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaFrac === brute(stream.size / 100L + 1))
    // empty input: empty result, no NPE (zero-partition sum is NULL)
    assert(Frequency.heavyHitters(Seq.empty[String].toDF("w"), "w", 1L).count() === 0)
    // NULL keys are ignored, not silently dropped AFTER qualifying
    val withNulls = (Seq.fill(500)(Option.empty[String]) ++
      Seq.fill(400)(Some("x")) ++ stream.take(100).map(Some(_))).toDF("w")
    val got = Frequency.heavyHitters(withNulls, "w", 300L, k = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("x" -> 400L))
  }

  test("groupQuantiles excludes NULL values from the ranks") {
    val df = (Seq.fill(10)(("g", Option.empty[Long])) ++
      (1L to 4L).map(v => ("g", Some(v)))).toDF("g", "v")
    val got = Frequency.groupQuantiles(df, "g", "v", Seq(2500, 10000))
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(got === Map(2500 -> 1L, 10000 -> 4L))
  }

  test("groupQuantiles equals the sort-based definition exactly") {
    val rows = (0 until 5000).map { i =>
      (s"g${i % 3}", (rnd.nextInt(40) * rnd.nextInt(40)).toLong)  // ties galore
    } :+ ("g_single", 7L)  // one-row group: every quantile is that value
    val df = rows.toDF("g", "v")
    val qs = Seq(1, 2500, 5000, 7500, 10000)
    val want = rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      qs.map { q =>
        val rank = ((sorted.size.toLong * q + 9999) / 10000).toInt
        (g, q, sorted(rank - 1))
      }
    }.toSet
    val got = Frequency.groupQuantiles(df, "g", "v", qs)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("heavyWords matches brute force over documents incl. empty text") {
    val docs = Seq(
      (1L, "a a a b b c"), (2L, "a b   b  d"), (3L, ""), (4L, "a e")
    ).toDF("doc_id", "text")
    val got = Frequency.heavyWords(docs, minCount = 2L, k = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 5L, "b" -> 4L))
    assert(Frequency.totalWords(docs) === 12L)
    assert(Frequency.totalWords(docs.where(col("doc_id") < 0)) === 0L)
  }

  test("percentileByGroup equals the strictly-below-count definition " +
       "(heavy ties, singleton group, NULL exclusion)") {
    val rnd = new scala.util.Random(909)
    val rows = (0L until 4000L).map(i =>
      (i, s"g${rnd.nextInt(5)}", rnd.nextInt(30).toLong)) :+
      (9999L, "solo", 7L)
    val expected = rows.groupBy(_._2).flatMap { case (_, rs) =>
      val n = rs.size.toLong
      rs.map { case (id, g, v) =>
        (id, g, v, rs.count(_._3 < v).toLong * 10000L / n)
      }
    }.toSet
    val withNull = rows.map { case (id, g, v) => (id, g, Option(v)) }
      .:+((8888L, "g0", Option.empty[Long]))
    val got = Frequency.percentileByGroup(
        withNull.toDF("id", "g", "v").repartition(9), Seq("g"), "v")
      .select("id", "g", "v", "pct_bp").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)                 // NULL row absent, rest exact
    assert(expected.exists(_._4 == 0L))      // minima are 0 bp
    assert(expected.forall(_._4 < 10000L))   // strictly below 10000
    intercept[IllegalArgumentException] {
      Frequency.percentileByGroup(
        rows.toDF("id", "g", "v").withColumn("pct_bp", lit(1)), Seq("g"), "v")
    }
  }

  test("topKPerGroup equals the window-rank formulation exactly, " +
       "across k, partitioning, a hot group, ties, and NULLs") {
    val rnd = new scala.util.Random(77)
    // hot group 0 gets ~half the rows; values collide often (ties broken
    // by id, which is unique by construction)
    val rows = (0 until 3000).map { i =>
      val g = if (rnd.nextBoolean()) 0L else rnd.nextInt(20).toLong + 1
      (g, rnd.nextInt(40).toLong, i.toLong)
    }
    val base = rows.toDF("g", "v", "id")
    val withNulls = base.unionByName(Seq(
      (99L, Option.empty[Long], Option(1000000L)),
      (99L, Option(5L), Option.empty[Long]))
      .toDF("g", "v", "id"))
    def brute(k: Int): Set[(Long, Long, Long, Long)] =
      rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._2, r._3)).take(k).zipWithIndex
          .map { case ((_, v, id), i) => (g, id, v, i + 1L) }
      }.toSet
    for (k <- Seq(1, 3, 50); parts <- Seq(1, 13)) {
      val got = Frequency.topKPerGroup(
          withNulls.repartition(parts), Seq("g"), "v", "id", k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === brute(k), s"k=$k parts=$parts")
    }
    // group 99 only has NULL-v / NULL-id rows -> absent entirely
    assert(Frequency.topKPerGroup(withNulls, Seq("g"), "v", "id", 3)
      .where(col("g") === 99L).count() === 0L)
  }
}
