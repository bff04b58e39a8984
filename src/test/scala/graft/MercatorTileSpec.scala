package graft

import org.apache.spark.sql.functions._

import graft.operators.ImageTable

/** Web-Mercator (slippy) tile assignment vs independently computed
  * vectors (standard OSM tile formula). */
class MercatorTileSpec extends SparkFunSuite {
  import spark.implicits._

  test("tile x/y match independent vectors incl. clamps") {
    val cases = Seq(
      (0.0, 0.0, 1, 1L, 1L),
      (4.35, 50.85, 10, 524L, 343L),
      (-0.1275, 51.507, 12, 2046L, 1362L),
      (139.6917, 35.6895, 15, 29099L, 12902L),
      (180.0, 85.06, 3, 7L, 0L),     // clamped to last tile / mercator top
      (-180.0, -85.06, 3, 0L, 7L))
    cases.foreach { case (lon, lat, z, ex, ey) =>
      val df = Seq((lon, lat)).toDF("lon", "lat")
        .select(ImageTable.mercatorTileX(col("lon"), z).as("x"),
                ImageTable.mercatorTileY(col("lat"), z).as("y"))
      val r = df.collect()(0)
      assert(r.getLong(0) == ex && r.getLong(1) == ey,
        s"($lon,$lat,z$z) -> (${r.getLong(0)},${r.getLong(1)}) expected ($ex,$ey)")
    }
  }

  test("withMercatorTiles adds per-zoom columns consistent with each other") {
    val df = LocalPts.points(500)
    val t = ImageTable.withMercatorTiles(df, Seq(8, 12))
    t.collect().foreach { r =>
      // zoom-8 tile is the zoom-12 tile shifted by 4 bits (same pyramid)
      assert(r.getAs[Long]("tile_z8_x") == (r.getAs[Long]("tile_z12_x") >> 4))
      assert(r.getAs[Long]("tile_z8_y") == (r.getAs[Long]("tile_z12_y") >> 4))
    }
  }

  private object LocalPts {
    def points(n: Int) = {
      val rnd = new scala.util.Random(3)
      Seq.fill(n)((rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 170 - 85))
        .toDF("lon", "lat")
    }
  }
}
