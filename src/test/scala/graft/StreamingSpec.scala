package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.fixtures.Fixtures
import graft.functions.geo
import graft.streaming.StreamingIngest

/** Streaming ingest: exactly-once across restarts (file-source offsets =
  * the streaming resume ledger), and a watermarked windowed tile count. */
class StreamingSpec extends SparkFunSuite {
  import spark.implicits._

  test("ingestOnce drains arrivals exactly once across restarts") {
    val base = Files.createTempDirectory("graft_stream_").toString
    val (src, dest, ckpt) = (s"$base/src", s"$base/dest", s"$base/ckpt")
    val rows = Fixtures.localImages(2000, withBytes = false)

    // minute 1: first file arrives
    rows.take(1200).toDF().coalesce(1).write.mode("append").parquet(src)
    val q1 = StreamingIngest.ingestOnce(spark, src, dest, ckpt)
    q1.awaitTermination()
    val n1 = spark.read.parquet(dest).count()
    assert(n1 == 1200)

    // minute 2: more files arrive; restart from the same checkpoint
    rows.drop(1200).toDF().coalesce(1).write.mode("append").parquet(src)
    val q2 = StreamingIngest.ingestOnce(spark, src, dest, ckpt)
    q2.awaitTermination()
    val out = spark.read.parquet(dest)
    assert(out.count() == 2000)
    assert(out.select("image_id").distinct().count() == 2000, "duplicates!")

    // derived tile columns present and correct
    val sample = out.limit(100).collect()
    sample.foreach { r =>
      val phash = r.getAs[Long]("phash")
      assert(r.getAs[Int]("cell") ==
        graft.cells.CellIndex.gridCell(
          graft.cells.CellIndex.bin(graft.cells.CellIndex.unpackX(phash)),
          graft.cells.CellIndex.bin(graft.cells.CellIndex.unpackY(phash))))
    }

    // minute 3: nothing new -> no new rows
    val q3 = StreamingIngest.ingestOnce(spark, src, dest, ckpt)
    q3.awaitTermination()
    assert(spark.read.parquet(dest).count() == 2000)
  }

  test("watermarked windowed tile counts over an event-time stream") {
    val base = Files.createTempDirectory("graft_stream_agg_").toString
    // event-time points: two 5-minute windows, two cells
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:30")
    val rows = (0 until 600).map { i =>
      val ts = new java.sql.Timestamp(t0.getTime + (i % 12) * 60000L)
      val lon = if (i % 2 == 0) 10.005 else 20.005
      (ts, lon, 30.005)
    }
    rows.toDF("ts", "lon", "lat").write.parquet(s"$base/src")
    val stream = spark.readStream
      .schema("ts timestamp, lon double, lat double")
      .parquet(s"$base/src")
      .withColumn("cell", geo.grid_cell(col("lon"), col("lat")))
    val agg = StreamingIngest.tileCounts(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tile_counts")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.sql("SELECT cell, sum(n) AS n FROM tile_counts GROUP BY cell")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val c1 = graft.cells.CellIndex.gridCellOf(10.005, 30.005)
    val c2 = graft.cells.CellIndex.gridCellOf(20.005, 30.005)
    assert(out == Map(c1 -> 300L, c2 -> 300L))
  }
}
