package graft

import org.apache.spark.sql.functions._

import graft.cells.CellIndex
import graft.fixtures.Fixtures
import graft.operators.SpatialJoin

/** Radius spatial join vs an O(n*m) brute-force oracle. */
class SpatialJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private def mkPoints(n: Int, seed: Long, maxLat: Double = 89.0) = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, r.nextDouble() * 359.0 - 179.5,
        (r.nextDouble() * 2 - 1) * maxLat)
    }
  }

  test("distanceJoin equals brute force (uniform points, 25km radius)") {
    val a = mkPoints(800, 1L)
    val b = mkPoints(1200, 2L)
    val radius = 25000.0
    val leftDF = a.toDF("a_id", "lon", "lat")
    val rightDF = b.toDF("b_id", "lon", "lat")
      .withColumn("cell", graft.functions.geo.grid_cell(col("lon"), col("lat")))
    val got = SpatialJoin.distanceJoin(leftDF, rightDF, radius).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val expected = (for {
      (ai, alon, alat) <- a; (bi, blon, blat) <- b
      if CellIndex.distMeters(alon, alat, blon, blat) <= radius
    } yield (ai, bi)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    assert(expected.nonEmpty, "weak fixture: no pairs in radius")
  }

  test("distanceJoin exact at high latitude (narrow cells) and across the antimeridian") {
    val a = Seq((1L, 179.98, 78.0), (2L, -179.97, 78.001), (3L, 10.0, 84.5))
    val b = Seq((10L, -179.99, 78.0005), (11L, 179.99, 77.999),
                (12L, 10.02, 84.5001), (13L, 12.0, 84.9))
    val radius = 3000.0
    val leftDF = a.toDF("a_id", "lon", "lat")
    val rightDF = b.toDF("b_id", "lon", "lat")
      .withColumn("cell", graft.functions.geo.grid_cell(col("lon"), col("lat")))
    val got = SpatialJoin.distanceJoin(leftDF, rightDF, radius).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val expected = (for {
      (ai, alon, alat) <- a; (bi, blon, blat) <- b
      if CellIndex.distMeters(alon, alat, blon, blat) <= radius
    } yield (ai, bi)).toSet
    assert(got == expected, s"got=$got expected=$expected")
    // the antimeridian pair must be present (wrap handling)
    assert(expected.exists { case (ai, bi) => ai == 1L && bi == 10L })
  }

  test("clustered fixture: join images to themselves finds the dense cores") {
    val imgs = Fixtures.localImages(3000, withBytes = false)
      .map(r => (r.image_id, CellIndex.getLon(CellIndex.unpackX(r.phash)),
        CellIndex.getLat(CellIndex.unpackY(r.phash))))
    val leftDF = imgs.toDF("a_id", "lon", "lat")
    val rightDF = imgs.toDF("b_id", "lon", "lat")
      .withColumn("cell", graft.functions.geo.grid_cell(col("lon"), col("lat")))
    val got = SpatialJoin.distanceJoin(leftDF, rightDF, 2000.0)
      .where(col("a_id") =!= col("b_id"))
    val n = got.count()
    val expected = (for {
      (ai, alon, alat) <- imgs; (bi, blon, blat) <- imgs
      if ai != bi && CellIndex.distMeters(alon, alat, blon, blat) <= 2000.0
    } yield 1).size
    assert(n == expected)
    assert(n > 0)
  }
}
