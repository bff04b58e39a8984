package graft

import org.apache.spark.sql.functions._
import graft.cells.CellIndex
import graft.functions.{geo, PointInPolygon}

/** The Catalyst expressions must agree bit-for-bit with the pure-Scala
  * CellIndex on random points, through the CODEGEN path (DataFrame eval),
  * and must stay inside WholeStageCodegen. */
class CellExpressionsSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val pts: Seq[(Double, Double)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(4000)((rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 180 - 90)) ++
      Seq((0.0, 0.0), (-180.0, -90.0), (180.0, 90.0), (-1e-9, 1e-9),
          (179.999999, -89.999999))
  }

  test("grid_cell / cell_at / pack_coord match CellIndex through codegen") {
    val df = pts.toDF("lon", "lat")
      .withColumn("gc", geo.grid_cell($"lon", $"lat"))
      .withColumn("c7", geo.cell_at($"lon", $"lat", 7))
      .withColumn("c14", geo.cell_at($"lon", $"lat", 14))
      .withColumn("pk", geo.pack_coord($"lon", $"lat"))
    df.collect().foreach { r =>
      val (lon, lat) = (r.getDouble(0), r.getDouble(1))
      assert(r.getInt(2) == CellIndex.gridCellOf(lon, lat), s"grid_cell($lon,$lat)")
      assert(r.getLong(3) == CellIndex.cellIdOf(lon, lat, 7))
      assert(r.getLong(4) == CellIndex.cellIdOf(lon, lat, 14))
      assert(r.getLong(5) ==
        CellIndex.packCoord(CellIndex.toX(lon), CellIndex.toY(lat)))
    }
  }

  test("packed-coord expressions round-trip and match the lon/lat forms") {
    val df = pts.toDF("lon", "lat")
      .withColumn("pk", geo.pack_coord($"lon", $"lat"))
      .withColumn("gc1", geo.grid_cell($"lon", $"lat"))
      .withColumn("gc2", geo.grid_cell_packed($"pk"))
      .withColumn("c9a", geo.cell_at($"lon", $"lat", 9))
      .withColumn("c9b", geo.cell_packed($"pk", 9))
      .withColumn("lon2", geo.lon_of($"pk"))
      .withColumn("lat2", geo.lat_of($"pk"))
    df.collect().foreach { r =>
      assert(r.getInt(3) == r.getInt(4), "grid cell via packed != via lonlat")
      assert(r.getLong(5) == r.getLong(6), "c9 via packed != via lonlat")
      // dequantized coords are within one quantum of the original
      assert(math.abs(r.getDouble(7) - r.getDouble(0)) <= 180.0 / Int.MaxValue * 1.001)
      assert(math.abs(r.getDouble(8) - r.getDouble(1)) <= 90.0 / Int.MaxValue * 1.001)
    }
  }

  test("expressions run inside WholeStageCodegen") {
    // parquet-backed input so ConvertToLocalRelation can't pre-evaluate
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(($"l_quantity" / lit(1000.0)).as("lon"),
              ($"l_extendedprice" / lit(100000.0)).as("lat"))
      .select(geo.cell_at($"lon", $"lat", 9).as("c9"),
              geo.grid_cell($"lon", $"lat").as("gc"))
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val exec = li.queryExecution.executedPlan
    val inWscg = exec.collect { case w: WholeStageCodegenExec => w }
      .exists(_.toString.contains("cell_r9"))
    assert(inWscg, s"cell_r9 not inside a WholeStageCodegen span:\n$exec")
    li.agg(max($"c9"), max($"gc")).collect() // force janino compile + run
  }

  test("SQL-registered functions agree with Column API") {
    geo.registerSql(spark)
    pts.take(500).toDF("lon", "lat").createOrReplaceTempView("pts_sql")
    val rows = spark.sql(
      """SELECT lon, lat, grid_cell(lon, lat) AS gc, cell_r9(lon, lat) AS c9,
        |       lat_of(pack_coord(lon, lat)) AS lat2
        |FROM pts_sql""".stripMargin).collect()
    rows.foreach { r =>
      assert(r.getInt(2) == CellIndex.gridCellOf(r.getDouble(0), r.getDouble(1)))
      assert(r.getLong(3) == CellIndex.cellIdOf(r.getDouble(0), r.getDouble(1), 9))
    }
  }

  test("optimizer rule rewrites dequantize->requantize chains to packed ops") {
    graft.plans.GraftExtensions.install(spark)
    val df = pts.take(2000).toDF("lon", "lat")
      .withColumn("pk", geo.pack_coord($"lon", $"lat"))
      .select($"pk",
        geo.grid_cell(geo.lon_of($"pk"), geo.lat_of($"pk")).as("gc"),
        geo.cell_at(geo.lon_of($"pk"), geo.lat_of($"pk"), 9).as("c9"),
        geo.pack_coord(geo.lon_of($"pk"), geo.lat_of($"pk")).as("pk2"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("grid_cell_packed"), optimized)
    assert(optimized.contains("cell_packed_r9"), optimized)
    // repack-of-unpack collapsed to a plain alias of pk (the only
    // remaining pack_coord is the legitimate one producing pk itself)
    assert(!optimized.contains("pack_coord(lon_of"), optimized)
    // and the rewrite is semantics-preserving (the soundness claim)
    df.collect().foreach { r =>
      val pk = r.getLong(0)
      assert(r.getInt(1) == CellIndex.gridCell(
        CellIndex.bin(CellIndex.unpackX(pk)), CellIndex.bin(CellIndex.unpackY(pk))))
      assert(r.getLong(2) == CellIndex.cellId(
        CellIndex.unpackX(pk), CellIndex.unpackY(pk), 9))
      assert(r.getLong(3) == pk)
    }
  }

  test("QDistArgmin / SqDistLongCols: codegen integer distances are " +
       "bit-identical to the higher-order lambda forms, including " +
       "length-mismatch and NULL-element semantics") {
    import org.apache.spark.sql.functions._
    import graft.functions.vec
    val cents = Array(Array(1L, 2L, 3L), Array(3L, 2L, 1L), Array(1L, 2L, 3L))
    val rows = Seq(
      (0L, Seq[java.lang.Long](1L, 2L, 3L)),      // exact hit, tie c0 vs c2
      (1L, Seq[java.lang.Long](3L, 2L, 1L)),      // second centroid
      (2L, Seq[java.lang.Long](2L, 2L, 2L)),      // equidistant tie -> c0
      (3L, Seq[java.lang.Long](9L, -4L, 100L)),   // far away
      (4L, Seq[java.lang.Long](1L, 2L)),          // LENGTH MISMATCH -> NULL
      (5L, Seq[java.lang.Long](1L, null, 3L)))    // NULL element -> NULL
    val df = rows.toDF("id", "q")
    // the higher-order reference (zip_with pads/propagates nulls)
    val hoDists = graft.operators.Similarity.largeDists(col("q"), cents)
    val ho = df.select(col("id"),
        (array_position(hoDists, array_min(hoDists)) - 1).cast("long").as("cl"),
        array_min(hoDists).as("d2"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1),
         if (r.isNullAt(2)) null else r.getLong(2))).toMap
    val cg = df.select(col("id"), vec.qdist_argmin(col("q"), cents).as("b"))
      .select(col("id"), col("b").getField("cluster").as("cl"),
        col("b").getField("d2").as("d2"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1),
         if (r.isNullAt(2)) null else r.getLong(2))).toMap
    assert(cg == ho, s"argmin: $cg vs $ho")
    assert(cg(2L) == ((0L, 2L)), "tie must pick the FIRST minimal centroid")
    assert(cg(4L) == ((null, null)) && cg(5L) == ((null, null)))
    // pair distance: codegen vs lambda over all row pairs
    val a = df.select(col("id").as("ia"), col("q").as("qa"))
    val b = df.select(col("id").as("ib"), col("q").as("qb"))
    val pairs = a.crossJoin(b)
    val lam = aggregate(zip_with(col("qa"), col("qb"),
      (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
    val got = pairs.select(col("ia"), col("ib"),
        vec.sqdist_long(col("qa"), col("qb")).as("cgd"), lam.as("lamd"))
      .collect()
    got.foreach { r =>
      val c = if (r.isNullAt(2)) null else r.getLong(2)
      val l = if (r.isNullAt(3)) null else r.getLong(3)
      assert(c == l, s"pair (${r.getLong(0)},${r.getLong(1)}): $c vs $l")
    }
    assert(got.exists(r => !r.isNullAt(2) && r.getLong(2) > 0))
  }

  test("point_in_polygon: codegen path matches interpreted oracle on a concave polygon") {
    // concave "L" polygon
    val poly = Array(0.0, 0.0, 4.0, 0.0, 4.0, 1.0, 1.0, 1.0, 1.0, 4.0, 0.0, 4.0)
    val px = Array(0.0, 4.0, 4.0, 1.0, 1.0, 0.0)
    val py = Array(0.0, 0.0, 1.0, 1.0, 4.0, 4.0)
    val rnd = new scala.util.Random(7)
    val qs = Seq.fill(3000)((rnd.nextDouble() * 6 - 1, rnd.nextDouble() * 6 - 1))
    val df = qs.toDF("x", "y")
      .withColumn("in", graft.functions.geo.point_in_polygon($"x", $"y", poly))
    df.collect().foreach { r =>
      val expect = PointInPolygon.contains(px, py, r.getDouble(0), r.getDouble(1))
      assert(r.getBoolean(2) == expect, s"PIP(${r.getDouble(0)},${r.getDouble(1)})")
    }
    // known inside / outside points
    val known = Seq((0.5, 0.5, true), (2.0, 0.5, true), (2.0, 2.0, false),
                    (0.5, 3.5, true), (3.5, 3.5, false), (-0.5, 0.5, false))
    known.foreach { case (x, y, e) =>
      assert(PointInPolygon.contains(px, py, x, y) == e, s"known ($x,$y)")
    }
  }
}
