package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cells.CellIndex.BBox
import graft.fixtures.Fixtures
import graft.oracle.RefOracle

/** Q4 (SURVEY §8): the reference's emission order is deterministic —
  * stage x xbin asc x ybin asc x block-chain (newest block first, FIFO
  * slots) x relation LIFO. The oracle reproduces it; this golden test
  * pins the exact sequence so accidental oracle changes are caught. */
class GoldenOrderSpec extends AnyFunSuite {

  test("oracle emission order is deterministic and matches the golden hash") {
    val planet = Fixtures.localPlanet(2000, 600, 100)
    val o = new RefOracle(planet, strictB1 = true)
    val c = Fixtures.cityCenters(Fixtures.DefaultSeed)(0)
    val rows = o.extract(BBox(c._1 - 1.0, c._2 - 1.0, c._1 + 1.0, c._2 + 1.0))
    // stage ordering invariant: all nodes, then all ways, then relations
    val kinds = rows.map(_.kind)
    val firstWay = kinds.indexOf("way")
    val firstRel = kinds.indexOf("relation")
    assert(!kinds.take(if (firstWay < 0) kinds.size else firstWay).contains("way"))
    if (firstRel >= 0) {
      assert(!kinds.drop(firstRel).exists(k => k == "node" || k == "way"))
    }
    // order-sensitive golden fingerprint of the full sequence
    val fingerprint = rows.foldLeft(17L) { (h, r) =>
      (h * 31 + r.kind.hashCode) * 31 + r.id * 31 + r.cell
    }
    val again = new RefOracle(planet, strictB1 = true)
      .extract(BBox(c._1 - 1.0, c._2 - 1.0, c._1 + 1.0, c._2 + 1.0))
      .foldLeft(17L)((h, r) => (h * 31 + r.kind.hashCode) * 31 + r.id * 31 + r.cell)
    assert(fingerprint == again, "oracle order is not deterministic")
    assert(rows.nonEmpty)
    // golden value generated once from this fixture+bbox; a change here
    // means the oracle's ORDER semantics changed — review SURVEY §8 Q4
    // before updating.
    val golden = -7988795168034267288L   // 948 rows, fixture(2000,600,100)
    info(s"golden order fingerprint: $fingerprint over ${rows.size} rows")
    assert(golden == fingerprint)
  }
}
