package graft

import org.apache.spark.sql.functions._

import graft.functions.osmCodec

/** Format-level codec round-trips (F6-F8). */
class OsmCodecSpec extends SparkFunSuite {
  import spark.implicits._

  private val samples: Seq[Seq[Long]] = {
    val r = new scala.util.Random(11)
    Seq.fill(200)(Seq.fill(1 + r.nextInt(20))(r.nextLong() % 1000000L)) ++
      Seq(Seq(5L), Seq(-3L, 7L), Seq(0L, 0L, 0L))
  }

  test("humanBytes matches the reference's unit ladder (F9)") {
    assert(osmCodec.humanBytes(0) == "0 bytes")
    assert(osmCodec.humanBytes(512) == "512 bytes")
    assert(osmCodec.humanBytes(1024) == "1.0 kB")
    assert(osmCodec.humanBytes(1536) == "1.5 kB")
    assert(osmCodec.humanBytes(5L * 1024 * 1024) == "5.0 MB")
    assert(osmCodec.humanBytes(2L * 1024 * 1024 * 1024 * 1024) == "2.0 TB")
  }

  test("delta encode/decode round-trip (refs and dense-node streams)") {
    val df = samples.toDF("arr")
      .withColumn("rt", osmCodec.deltaDecode(osmCodec.deltaEncode(col("arr"))))
      .withColumn("ok", col("rt") === col("arr"))
    assert(df.where(!col("ok")).count() == 0)
    // vector check: decode of deltas is the running sum
    val one = Seq(Seq(100L, 2L, -5L, 3L)).toDF("arr")
      .select(osmCodec.deltaDecode(col("arr"))).collect()(0).getSeq[Long](0)
    assert(one == Seq(100L, 102L, 97L, 100L))
  }

  test("sentinel encode/decode round-trip; last element negated on encode") {
    val pos = samples.map(_.map(math.abs).map(_ + 1))   // ids are positive
    val df = pos.toDF("arr")
      .withColumn("enc", osmCodec.sentinelEncode(col("arr")))
      .withColumn("rt", osmCodec.sentinelDecode(col("enc")))
    df.collect().foreach { r =>
      val arr = r.getSeq[Long](0); val enc = r.getSeq[Long](1); val rt = r.getSeq[Long](2)
      assert(enc.last == -arr.last && enc.init == arr.init)
      assert(rt == arr)
    }
  }

  test("zigzag round-trip and vectors") {
    val vs = Seq(0L, -1L, 1L, -2L, 2L, Long.MaxValue / 2, -Long.MaxValue / 2)
    val df = vs.toDF("v")
      .withColumn("z", osmCodec.zigzagEncode(col("v")))
      .withColumn("rt", osmCodec.zigzagDecode(col("z")))
    df.collect().foreach { r =>
      assert(r.getLong(2) == r.getLong(0), s"zigzag(${r.getLong(0)})")
    }
    // canonical vectors: 0->0, -1->1, 1->2, -2->3, 2->4
    val z = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(z(0L) == 0L && z(-1L) == 1L && z(1L) == 2L && z(-2L) == 3L && z(2L) == 4L)
  }

  test("fnv1a32 matches published test vectors") {
    assert(osmCodec.fnv1a32("") == 0x811C9DC5)
    assert(osmCodec.fnv1a32("a") == 0xE40C292C)
    assert(osmCodec.fnv1a32("foobar") == 0xBF9CF968)
  }

  test("fillFactor and writeExtract") {
    import graft.fixtures.Fixtures
    import graft.operators.PlanetExtract
    val p = Fixtures.localPlanet(1000, 300, 50)
    val t = PlanetExtract.ingest(p.nodes.toDF(), p.ways.toDF(), p.relations.toDF())
    val (used, ratio) = PlanetExtract.fillFactor(t)
    assert(used > 0 && ratio > 0 && ratio < 0.01)
    val dir = java.nio.file.Files.createTempDirectory("graft_extract_").toString
    val ex = PlanetExtract.bbox(t, graft.cells.CellIndex.BBox(0.01, 0.01, 179.9, 89.9))
    PlanetExtract.writeExtract(ex, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == ex.count())
    assert(back.select("kind").distinct().count() == 3)
  }
}
