package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.cells.CellIndex.BBox
import graft.fixtures.Fixtures
import graft.operators.PlanetExtract

/** Concurrent extracts in ONE session — the engine's answer to the
  * reference's process-per-request server (vexserver.js): Spark's
  * scheduler interleaves jobs; results must equal sequential runs. */
class ConcurrencySpec extends SparkFunSuite {
  import spark.implicits._

  test("8 concurrent bbox extracts match their sequential results") {
    val planet = Fixtures.localPlanet(3000, 900, 150)
    val t0 = PlanetExtract.ingest(planet.nodes.toDF(), planet.ways.toDF(),
      planet.relations.toDF())
    val t = PlanetExtract.PlanetTables(
      t0.nodes.cache(), t0.ways.cache(), t0.relations.cache())
    t.nodes.count(); t.ways.count(); t.relations.count()   // materialize

    val centers = Fixtures.cityCenters(Fixtures.DefaultSeed)
    val bboxes = (0 until 8).map { i =>
      val c = centers(i % centers.length)
      BBox(c._1 - 0.5 - i * 0.1, c._2 - 0.4, c._1 + 0.5 + i * 0.1, c._2 + 0.4)
    }
    def run(b: BBox): Set[(String, Long)] =
      PlanetExtract.bbox(t, b).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet

    val sequential = bboxes.map(run)
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val concurrent = Await.result(
        Future.sequence(bboxes.map(b => Future(run(b)))), 5.minutes)
      sequential.zip(concurrent).zipWithIndex.foreach { case ((s, c), i) =>
        assert(s == c, s"bbox $i differs under concurrency")
      }
      assert(sequential.exists(_.nonEmpty))
    } finally pool.shutdown()
  }
}
