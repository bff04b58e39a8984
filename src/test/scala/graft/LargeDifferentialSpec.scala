package graft

import graft.cells.CellIndex.BBox
import graft.fixtures.Fixtures
import graft.operators.PlanetExtract
import graft.oracle.RefOracle

/** Exact-match differential at 5x the standard fixture scale — the same
  * north_rule criterion with denser cells (deeper way-block chains, more
  * emit-once collisions, more B1 anchors). */
class LargeDifferentialSpec extends SparkFunSuite {
  import spark.implicits._

  test("20k-node planet: engine extract == oracle on three bboxes (strict)") {
    val planet = Fixtures.localPlanet(20000, 6000, 1200)
    val t = PlanetExtract.ingest(planet.nodes.toDF(), planet.ways.toDF(),
      planet.relations.toDF(), strictB1 = true)
    val cached = PlanetExtract.PlanetTables(
      t.nodes.cache(), t.ways.cache(), t.relations.cache())
    val o = new RefOracle(planet, strictB1 = true)
    val cs = Fixtures.cityCenters(Fixtures.DefaultSeed)
    val bboxes = Seq(
      BBox(cs(0)._1 - 1.0, cs(0)._2 - 0.8, cs(0)._1 + 1.0, cs(0)._2 + 0.8),
      BBox(cs(2)._1 - 0.3, cs(2)._2 - 0.3, cs(2)._1 + 0.3, cs(2)._2 + 0.3),
      BBox(0.01, 0.01, 179.99, 89.99))
    bboxes.foreach { b =>
      val engine = PlanetExtract.bbox(cached, b).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val oracle = o.extract(b).map(r => (r.kind, r.id, r.cell)).toSet
      assert(engine == oracle,
        s"$b: engine-only=${(engine -- oracle).take(3)} oracle-only=${(oracle -- engine).take(3)}")
      assert(engine.nonEmpty)
    }
  }

  test("hot cell with >32 ways (multi-block chains): engine == oracle") {
    // 100 ways all anchored at nodes inside ONE grid cell: the oracle's
    // 32-slot block-chain simulation must walk 4 chained blocks
    val nodes = (1 to 200).map { i =>
      Fixtures.NodeRow(i.toLong, 50.0001 + (i % 20) * 1e-5,
        40.0001 + (i / 20) * 1e-5, Map.empty)
    }
    val ways = (1 to 100).map { w =>
      Fixtures.WayRow(w.toLong,
        Array((w % 200 + 1).toLong, ((w + 7) % 200 + 1).toLong), Map.empty)
    }
    val planet = Fixtures.Planet(nodes, ways, Seq.empty)
    val t = PlanetExtract.ingest(nodes.toDF(), ways.toDF(),
      spark.emptyDataset[Fixtures.RelationRow].toDF())
    val b = BBox(49.9, 39.9, 50.1, 40.1)
    val engine = PlanetExtract.bbox(t, b).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val oracle = new RefOracle(planet).extract(b)
      .map(r => (r.kind, r.id)).toSet
    assert(engine == oracle)
    assert(engine.count(_._1 == "way") == 100)
    // the chain really was multi-block
    val maxPerCell = t.ways.groupBy("cell").count()
      .agg(org.apache.spark.sql.functions.max("count")).collect()(0).getLong(0)
    assert(maxPerCell > 32, s"max ways/cell $maxPerCell")
  }
}
