package graft.petro

import org.scalatest.funsuite.AnyFunSuite

/** Ternary axis-geometry goldens ported from the reference's verified
  * positions (reference: tests/test_plotting.py:737-768). */
class TernaryGeometrySpec extends AnyFunSuite {

  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  test("project vertices match expected coordinates (test_plotting.py:739)") {
    val (tx, ty) = PlotData.projectPoint(1, 0, 0)
    assert(tx === 0.0 && ty === 1.0)
    val (lx, ly) = PlotData.projectPoint(0, 1, 0)
    assert(math.abs(lx - -0.5773502691896258) < 1e-12 && ly === 0.0)
    val (rx, ry) = PlotData.projectPoint(0, 0, 1)
    assert(math.abs(rx - 0.5773502691896258) < 1e-12 && ry === 0.0)
  }

  test("polygon vertices: full triangle when unlimited (test_plotting.py:745)") {
    val poly = PlotData.polygonVertices(None, None, None, 100.0)
    assert(poly.map(v => (v(0), v(1), v(2))).toSet ==
      Set((100.0, 0.0, 0.0), (0.0, 0.0, 100.0), (0.0, 100.0, 0.0)))
  }

  test("polygon vertices: extreme tlim not degenerate (test_plotting.py:751)") {
    val poly = PlotData.polygonVertices(Some((0.0, 20.0)), None, None, 100.0)
    assert(poly.length == 4)
    poly.foreach { v =>
      assert(math.abs(v(0)) < 1e-9 || math.abs(v(0) - 20.0) < 1e-9)
      assert(math.abs(v(0) + v(1) + v(2) - 100.0) < 1e-9)
    }
  }

  test("axis ticks match verified positions (test_plotting.py:760)") {
    val poly = PlotData.polygonVertices(None, None, None, 100.0)
    val ticks = PlotData.axisTicks(poly, 0, 0, 100)
      .map { case ((x, y), value, _) => value -> ((r3(x), r3(y))) }.toMap
    assert(ticks(0.0) == ((0.577, 0.0)))
    assert(ticks(20.0) == ((0.462, 0.2)))
    assert(ticks(100.0) == ((0.0, 1.0)))
  }

  test("nice ticks span the range at the 1/2/2.5/5/10 steps") {
    assert(PlotData.niceTicks(0, 100) == Seq(0.0, 20.0, 40.0, 60.0, 80.0, 100.0))
    assert(PlotData.niceTicks(0, 1).map(r3) ==
      Seq(0.0, 0.2, 0.4, 0.6, 0.8, 1.0))
    // zoomed sub-range keeps only in-range ticks
    val zoomed = PlotData.niceTicks(10, 30)
    assert(zoomed.nonEmpty && zoomed.forall(v => v >= 10 - 1e-9 && v <= 30 + 1e-9))
  }

  test("axis ticks split across edges under a foreign limit keep outward directions") {
    // clip the top vertex off: t in [0, 20] — the r-axis scale now spans
    // two owning edges; every returned tick must be a nice value inside
    // the polygon's r-range with a unit direction
    val poly = PlotData.polygonVertices(Some((0.0, 20.0)), None, None, 100.0)
    val ticks = PlotData.axisTicks(poly, 2, 0, 100)
    assert(ticks.nonEmpty)
    ticks.foreach { case ((_, _), v, (dx, dy)) =>
      assert(v >= -1e-9 && v <= 100 + 1e-9)
      assert(math.abs(math.hypot(dx, dy) - 1.0) < 1e-9)
    }
  }
}
