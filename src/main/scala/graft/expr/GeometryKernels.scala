package graft.expr

/** Scalar geometry kernels cloned from the reference, used by the typed
  * Dataset vector operators and pinned by GeometrySpec to the reference's
  * own unit vectors.
  */
object GeometryKernels {
  val Epsilon: Double = java.lang.Math.ulp(1.0) // f64::EPSILON

  /** polygon_area (algorithms/poly_area.rs:13-26): |shoelace| / 2; accepts
    * open or closed rings (the wrap term vanishes for closed ones). */
  def polygonArea(xs: Array[Double], ys: Array[Double]): Double = {
    val n = xs.length
    var area = 0.0
    var i = 0
    while (i < n - 1) { area += xs(i) * ys(i + 1) - xs(i + 1) * ys(i); i += 1 }
    area += xs(n - 1) * ys(0) - xs(0) * ys(n - 1)
    math.abs(area) / 2.0
  }

  /** polygon_perimeter (algorithms/poly_perimeter.rs:13-24). */
  def polygonPerimeter(xs: Array[Double], ys: Array[Double]): Double = {
    val n = xs.length
    var per = 0.0
    var i = 0
    while (i < n - 1) {
      val dx = xs(i + 1) - xs(i); val dy = ys(i + 1) - ys(i)
      per += math.sqrt(dx * dx + dy * dy) // Point2D::distance form, not hypot
      i += 1
    }
    val dx = xs(0) - xs(n - 1); val dy = ys(0) - ys(n - 1)
    per + math.sqrt(dx * dx + dy * dy)
  }

  /** is_hole (vector/shapefile/geometry.rs:278-393): CCW rings are holes;
    * convexity-aware cross-product test with signed-area fallback.
    * Faithful clone INCLUDING the reference's end-point quirk: for
    * part_num == num_parts-2 the end point is taken from num_points-2
    * (the last part's end) rather than parts[part_num+1]-2.
    * @param parts 0-based start offsets of each part in xs/ys */
  def isHole(partNum: Int, parts: Array[Int],
             xs: Array[Double], ys: Array[Double]): Boolean = {
    val numParts = parts.length
    val numPoints = xs.length
    if (partNum < 0 || partNum > numParts - 1) return false
    val st = parts(partNum)
    val end =
      if (partNum < numParts - 2) parts(partNum + 1) - 2
      else numPoints - 2
    val m = end - st + 1
    if (m < 3) return false

    val cross = new Array[Double](m)
    var j = 0
    while (j < m) {
      val n2 = st + j
      val n1 = if (j == 0) st + m - 1 else st + j - 1
      val n3 = if (j == m - 1) st else st + j + 1
      cross(j) = (xs(n2) - xs(n1)) * (ys(n3) - ys(n2)) -
        (ys(n2) - ys(n1)) * (xs(n3) - xs(n2))
      j += 1
    }
    val testSign = cross(0) >= 0.0
    var isConvex = true
    j = 1
    while (j < m && isConvex) {
      if (cross(j) >= 0.0 && !testSign) isConvex = false
      else if (cross(j) < 0.0 && testSign) isConvex = false
      j += 1
    }
    if (isConvex) testSign
    else {
      var area = 0.0
      j = 0
      while (j < m) {
        val n1 = st + j
        val n2 = if (j < m - 1) st + j + 1 else st
        area += xs(n1) * ys(n2) - xs(n2) * ys(n1)
        j += 1
      }
      area /= 2.0
      area >= 0.0
    }
  }

  /** LineSegment::get_intersection (structures/line_segment.rs:33-110):
    * point intersection, or collinear-overlap segment (p1==p2 for points),
    * or None. Includes the bbox gate the reference applies first. */
  def segIntersect(ax1: Double, ay1: Double, ax2: Double, ay2: Double,
                   bx1: Double, by1: Double, bx2: Double, by2: Double)
      : Option[(Double, Double, Double, Double)] = {
    def overlaps = math.max(ax1, ax2) >= math.min(bx1, bx2) &&
      math.max(bx1, bx2) >= math.min(ax1, ax2) &&
      math.max(ay1, ay2) >= math.min(by1, by2) &&
      math.max(by1, by2) >= math.min(ay1, ay2)
    if (!overlaps) return None
    val denom = (ax1 - ax2) * (by1 - by2) - (ay1 - ay2) * (bx1 - bx2)
    if (denom != 0.0) {
      val t = ((ax1 - bx1) * (by1 - by2) - (ay1 - by1) * (bx1 - bx2)) / denom
      val u = -((ax1 - ax2) * (ay1 - by1) - (ay1 - ay2) * (ax1 - bx1)) / denom
      if (t >= 0.0 && t <= 1.0 && u >= 0.0 && u <= 1.0) {
        val px = ax1 + t * (ax2 - ax1)
        val py = ay1 + t * (ay2 - ay1)
        return Some((px, py, px, py))
      }
    }
    // coincident-line check (is_point_on_line, :137-140)
    val cr = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
    if (math.abs(cr) < Epsilon) {
      def isBetween(px: Double, py: Double, qx: Double, qy: Double,
                    rx: Double, ry: Double): Boolean = {
        val cp = (py - qy) * (rx - qx) - (px - qx) * (ry - qy)
        cp > -Epsilon && cp < Epsilon &&
          px >= math.min(qx, rx) && px <= math.max(qx, rx) &&
          py >= math.min(qy, ry) && py <= math.max(qy, ry)
      }
      val pts = Array((ax1, ay1), (bx1, by1), (ax2, ay2), (bx2, by2))
      val contained = Array(
        isBetween(ax1, ay1, bx1, by1, bx2, by2),
        isBetween(bx1, by1, ax1, ay1, ax2, ay2),
        isBetween(ax2, ay2, bx1, by1, bx2, by2),
        isBetween(bx2, by2, ax1, ay1, ax2, ay2))
      val i = contained.indexWhere(identity)
      val j = contained.lastIndexWhere(identity)
      if (i >= 0 && j >= 0)
        return Some((pts(i)._1, pts(i)._2, pts(j)._1, pts(j)._2))
    }
    None
  }
}
