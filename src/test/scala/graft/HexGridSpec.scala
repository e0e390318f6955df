package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cells.HexGrid

class HexGridSpec extends AnyFunSuite {

  private def prop(n: Int = 300)(f: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(7)
    (1 to n).foreach(_ => f(rnd))
  }

  test("assignment picks the nearest hex center (cube-rounding property)") {
    prop() { rnd =>
      val s = 0.5 + rnd.nextDouble()
      val x = (rnd.nextDouble() - 0.5) * 100
      val y = (rnd.nextDouble() - 0.5) * 100
      val id = HexGrid.hexAt(x, y, s)
      val (q, r) = HexGrid.hexQR(id)
      val (cx, cy) = HexGrid.center(q, r, s)
      val dSelf = math.hypot(x - cx, y - cy)
      // no neighbor center may be strictly closer
      for (nid <- HexGrid.ringK(id, 1)) {
        val (nq, nr) = HexGrid.hexQR(nid)
        val (nx, ny) = HexGrid.center(nq, nr, s)
        assert(math.hypot(x - nx, y - ny) >= dSelf - 1e-9)
      }
    }
  }

  test("hex id pack/unpack roundtrip") {
    prop() { rnd =>
      val q = rnd.nextLong() % (1L << 29)
      val r = rnd.nextLong() % (1L << 29)
      assert(HexGrid.hexQR(HexGrid.hexId(q, r)) === ((q, r)))
    }
  }

  test("ringK: 6k cells, all at exactly distance k, disjoint rings") {
    val id = HexGrid.hexAt(3.2, -7.7, 1.0)
    for (k <- 1 to 4) {
      val ring = HexGrid.ringK(id, k)
      assert(ring.length === 6 * k)
      assert(ring.distinct.length === ring.length)
      assert(ring.forall(c => HexGrid.hexDistance(id, c) === k))
    }
    assert(HexGrid.diskK(id, 3).length === 1 + 6 + 12 + 18)
  }

  test("exact rounding ties round half away from zero (SQL ROUND semantics)") {
    // independent reference restated with explicit SQL HALF_UP rounding
    def sqlRound(x: Double): Long =
      (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
    def ref(x: Double, y: Double, s: Double): (Long, Long) = {
      val qf = (math.sqrt(3.0) / 3.0 * x - 1.0 / 3.0 * y) / s
      val rf = (2.0 / 3.0 * y) / s
      val yf = -qf - rf
      var rx = sqlRound(qf); var ry = sqlRound(yf); var rz = sqlRound(rf)
      val dx = math.abs(rx - qf); val dy = math.abs(ry - yf); val dz = math.abs(rz - rf)
      if (dx > dy && dx > dz) rx = -ry - rz
      else if (dy > dz) ry = -rx - rz
      else rz = -rx - ry
      (rx, rz)
    }
    // reachable exact tie: qf = -0.5 at (0, 3, 2) since IEEE (1.0/3.0)*3.0 == 1.0
    assert(HexGrid.axialAt(0.0, 3.0, 2.0) === ref(0.0, 3.0, 2.0))
    prop() { rnd =>
      val s = 0.5 + rnd.nextDouble()
      val x = (rnd.nextDouble() - 0.5) * 100
      val y = (rnd.nextDouble() - 0.5) * 100
      assert(HexGrid.axialAt(x, y, s) === ref(x, y, s))
    }
  }

  test("centers of adjacent hexes are sqrt(3)*s apart") {
    val s = 2.0
    val id = HexGrid.hexAt(0.0, 0.0, s)
    val (q, r) = HexGrid.hexQR(id)
    val (cx, cy) = HexGrid.center(q, r, s)
    for (nid <- HexGrid.ringK(id, 1)) {
      val (nq, nr) = HexGrid.hexQR(nid)
      val (nx, ny) = HexGrid.center(nq, nr, s)
      assert(math.abs(math.hypot(nx - cx, ny - cy) - math.sqrt(3.0) * s) < 1e-9)
    }
  }
}
