package graft

import graft.cells.CellIndex
import graft.fixtures.Fixtures
import graft.operators.Routable

/** Routable graph vs a direct Scala oracle on the planet fixture. */
class RoutableSpec extends SparkFunSuite {
  import spark.implicits._

  private lazy val planet = Fixtures.localPlanet(3000, 900, 0)
  private lazy val waysDF = planet.ways.toDF().cache()
  private lazy val nodesDF = planet.nodes.toDF().cache()

  private lazy val hwWays = planet.ways.filter(_.tags.contains("highway"))
  private lazy val oracleVertices: Map[Long, (Long, Boolean)] = {
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    val endpoint = scala.collection.mutable.Set.empty[Long]
    hwWays.foreach { w =>
      w.refs.foreach(r => counts(r) = counts.getOrElse(r, 0L) + 1)
      endpoint += w.refs.head
      endpoint += w.refs.last
    }
    counts.toMap.collect { case (id, n) if n >= 2 || endpoint(id) =>
      id -> (n, endpoint(id))
    }
  }

  test("vertices match the oracle (endpoints + shared/repeated nodes)") {
    val got = Routable.vertices(waysDF).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got == oracleVertices,
      s"missing=${(oracleVertices.keySet -- got.keySet).take(5)} " +
      s"extra=${(got.keySet -- oracleVertices.keySet).take(5)}")
    // fixture must exercise the non-endpoint intersection case
    assert(oracleVertices.exists { case (_, (n, ep)) => n >= 2 && !ep })
  }

  test("edges match the oracle segmentation with equirect lengths") {
    val coord = planet.nodes.map(n => n.id -> (n.lon, n.lat)).toMap
    val vset = oracleVertices.keySet
    val expected = hwWays.flatMap { w =>
      val vPos = w.refs.indices.filter(i => vset(w.refs(i)))
      vPos.zip(vPos.tail).zipWithIndex.map { case ((p, q), k) =>
        val len = (p until q).map { i =>
          val (lo1, la1) = coord(w.refs(i)); val (lo2, la2) = coord(w.refs(i + 1))
          CellIndex.distMeters(lo1, la1, lo2, la2)
        }.sum
        (w.id, k + 1L, w.refs(p), w.refs(q), (q - p).toLong, len)
      }
    }.map(e => (e._1, e._2, e._3, e._4, e._5) -> e._6).toMap
    val got = Routable.edges(waysDF, nodesDF).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)) -> r.getDouble(5)).toMap
    assert(got.keySet == expected.keySet,
      s"missing=${(expected.keySet -- got.keySet).take(3)} " +
      s"extra=${(got.keySet -- expected.keySet).take(3)}")
    got.foreach { case (k, len) => assert(math.abs(len - expected(k)) < 1e-6, k) }
    // magnitude sanity mirroring the reference's note: vertices < highway nodes
    assert(expected.nonEmpty)
  }

  test("strict is_highway prefix quirk widens the way set") {
    val df = Seq(
      (1L, Array(1L, 2L, 3L), Map("high" -> "x")),       // prefix of highway
      (2L, Array(2L, 3L, 4L), Map("highway" -> "primary")),
      (3L, Array(4L, 5L, 6L), Map("building" -> "yes"))).toDF("id", "refs", "tags")
    import org.apache.spark.sql.functions.col
    val strictN = df.where(Routable.isHighway(col("tags"), strict = true)).count()
    val fixedN = df.where(Routable.isHighway(col("tags"))).count()
    assert(strictN == 2 && fixedN == 1)
  }
}
