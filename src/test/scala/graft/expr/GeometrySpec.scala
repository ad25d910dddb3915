package graft.expr

import graft.SparkSpec
import graft.core.Zones

/** Pins the geometry kernels to the reference's own unit vectors
  * (poly_area.rs:28-52, line_ops.rs:70-137) and to the Zones fixture. */
class GeometrySpec extends SparkSpec {
  import GeometryKernels._

  test("polygon_area: reference vectors (closed + open square)") {
    assert(polygonArea(Array(0.0, 5, 5, 0, 0), Array(0.0, 0, 5, 5, 0)) === 25.0)
    assert(polygonArea(Array(0.0, 5, 5, 0), Array(0.0, 0, 5, 5)) === 25.0)
  }

  test("polygon_perimeter: closed square") {
    assert(polygonPerimeter(Array(0.0, 5, 5, 0, 0), Array(0.0, 0, 5, 5, 0)) === 20.0)
  }

  test("is_hole: CW hulls are not holes, CCW rings are (per-ring records)") {
    Zones.worldZones.foreach { r =>
      val got = isHole(0, Array(0), r.xs, r.ys)
      assert(got === r.isHole, s"fid ${r.fid} ring ${r.ringId}")
    }
  }

  test("is_hole clones the reference end-point quirk for part num_parts-2") {
    // geometry.rs:309-314: for part_num == num_parts-2 the end point is
    // num_points-2 (the LAST part's end), so that part is evaluated over a
    // vertex span bleeding into the following part. We reproduce it.
    val hull = Zones.worldZones.find(r => r.fid == 3 && !r.isHole).get
    val hole = Zones.worldZones.find(r => r.fid == 3 && r.isHole).get
    val xs = hull.xs ++ hole.xs
    val ys = hull.ys ++ hole.ys
    val parts = Array(0, hull.xs.length)
    // part 1 (the true hole, == num_parts-1) is classified correctly…
    assert(isHole(1, parts, xs, ys) === true)
    // …and part 0 (== num_parts-2) is evaluated over hull+hole combined —
    // same answer as running the kernel on the concatenated span directly,
    // NOT necessarily the geometric truth of ring 0 alone.
    val combined = isHole(0, Array(0), xs, ys)
    assert(isHole(0, parts, xs, ys) === combined)
  }

  private def lineIntersections(l1: Seq[(Double, Double)],
                                l2: Seq[(Double, Double)]) =
    for {
      a <- l1.indices.dropRight(1); b <- l2.indices.dropRight(1)
      h <- segIntersect(l1(a)._1, l1(a)._2, l1(a + 1)._1, l1(a + 1)._2,
                        l2(b)._1, l2(b)._2, l2(b + 1)._1, l2(b + 1)._2)
    } yield h

  test("line intersections: reference vectors (line_ops.rs:76-96)") {
    val l1 = Seq((0.0, 0.0), (10.0, 10.0), (12.0, 6.0), (6.0, 0.0))
    val l2 = Seq((-1.0, 5.0), (6.0, 5.0), (6.0, 2.0), (12.0, 2.0))
    assert(lineIntersections(l1, l2) ===
      Seq((5.0, 5.0, 5.0, 5.0), (8.0, 2.0, 8.0, 2.0)))
  }

  test("line intersections: disjoint (line_ops.rs:98-110)") {
    val l1 = Seq((0.0, 0.0), (10.0, 10.0), (12.0, 6.0), (6.0, 0.0))
    val l2 = Seq((-1.0, -5.0), (-6.0, -5.0))
    assert(lineIntersections(l1, l2).isEmpty)
  }

  test("line intersections: vertical line (line_ops.rs:112-123)") {
    val l1 = Seq((0.0, 0.0), (10.0, 10.0))
    val l2 = Seq((5.0, 1.0), (5.0, 10.0))
    assert(lineIntersections(l1, l2) === Seq((5.0, 5.0, 5.0, 5.0)))
  }

  test("line intersections: coincident overlap (line_ops.rs:125-137)") {
    val l1 = Seq((0.0, 0.0), (10.0, 10.0))
    val l2 = Seq((5.0, 5.0), (18.0, 18.0))
    assert(lineIntersections(l1, l2) === Seq((5.0, 5.0, 10.0, 10.0)))
  }
}
