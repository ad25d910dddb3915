package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Convex hull (algorithms/convex_hull.rs:12-39 — Graham scan, CCW output,
  * lowest-then-rightmost anchor) and MinimumBoundingBox
  * (algorithms/minimum_bounding_box.rs:28-140 — rotating calipers over hull
  * edges, minimising area).
  *
  * Scale shape: hulls compose — hull(A ∪ B) = hull(hull(A) ∪ hull(B)) — so
  * the operator computes per-partition local hulls (mapPartitions), then
  * merges the (small) hull vertex sets per feature. The merge side is
  * bounded by O(Σ hull sizes), never by the input cardinality.
  */
object Hull {

  /** convex_hull clone; returns CCW hull, anchor first is NOT guaranteed by
    * the reference either (it returns the scan stack as-is). */
  def convexHull(pts: Array[(Double, Double)]): Array[(Double, Double)] = {
    if (pts.length <= 2) return pts.distinct
    // find_lowest_point (:76-86): lowest y, ties → rightmost x, swapped to front
    val arr = pts.clone()
    var lowest = 0
    var i = 1
    while (i < arr.length) {
      if (arr(i)._2 < arr(lowest)._2 ||
          (arr(i)._2 == arr(lowest)._2 && arr(i)._1 > arr(lowest)._1)) lowest = i
      i += 1
    }
    val t = arr(0); arr(0) = arr(lowest); arr(lowest) = t
    val head = arr(0)
    // sort by angle to head (:42-72)
    val sorted = head +: arr.tail.sortWith { (a, b) =>
      val area = (a._1 - head._1) * (b._2 - head._2) - (b._1 - head._1) * (a._2 - head._2)
      if (area == 0.0) {
        val x = math.abs(a._1 - head._1) - math.abs(b._1 - head._1)
        val y = math.abs(a._2 - head._2) - math.abs(b._2 - head._2)
        x < 0.0 || y < 0.0
      } else area > 0.0
    }
    val hull = scala.collection.mutable.ArrayBuffer(sorted(0), sorted(1))
    i = 2
    while (i < sorted.length) {
      var done = false
      while (!done) {
        val m1 = hull.length - 1; val m0 = m1 - 1
        val det = (hull(m1)._1 - hull(m0)._1) * (sorted(i)._2 - hull(m0)._2) -
          (sorted(i)._1 - hull(m0)._1) * (hull(m1)._2 - hull(m0)._2)
        if (det > 0.0) { hull += sorted(i); done = true } // Left
        else if (det == 0.0) { hull.remove(hull.length - 1); hull += sorted(i); done = true } // Ahead
        else { hull.remove(hull.length - 1); if (hull.length < 2) { hull += sorted(i); done = true } } // Right
      }
      i += 1
    }
    hull.toArray
  }

  /** minimum_bounding_box (Area criterion): rotate hull to each edge
    * orientation, track the min-area axis-aligned box, un-rotate corners. */
  def minimumBoundingBox(pts: Array[(Double, Double)]): Array[(Double, Double)] = {
    val hull = convexHull(pts)
    if (hull.length < 3) return hull
    val east = hull.map(_._1).max; val west = hull.map(_._1).min
    val north = hull.map(_._2).max; val south = hull.map(_._2).min
    val midx = west + (east - west) / 2.0
    val midy = south + (north - south) / 2.0
    var minMetric = Double.PositiveInfinity
    var xAxis = 9999999.0; var yAxis = 9999999.0
    var slope = 0.0; var cx = 0.0; var cy = 0.0
    for (m <- 0 until hull.length - 1) {
      val psi = -math.atan2(hull(m + 1)._2 - hull(m)._2, hull(m + 1)._1 - hull(m)._1)
      var (e, w, n, s) = (Double.NegativeInfinity, Double.PositiveInfinity,
        Double.NegativeInfinity, Double.PositiveInfinity)
      hull.foreach { p =>
        val x0 = p._1 - midx; val y0 = p._2 - midy
        val xr = x0 * math.cos(psi) - y0 * math.sin(psi)
        val yr = x0 * math.sin(psi) + y0 * math.cos(psi)
        e = math.max(e, xr); w = math.min(w, xr)
        n = math.max(n, yr); s = math.min(s, yr)
      }
      val ax = e - w; val ay = n - s
      val metric = ax * ay
      if (metric < minMetric) {
        minMetric = metric; xAxis = ax; yAxis = ay; slope = -psi
        cx = w + ax / 2.0; cy = s + ay / 2.0
      }
    }
    // corners in rotated frame → world frame
    val cos = math.cos(slope); val sin = math.sin(slope)
    val corners = Array((cx - xAxis / 2, cy - yAxis / 2), (cx + xAxis / 2, cy - yAxis / 2),
      (cx + xAxis / 2, cy + yAxis / 2), (cx - xAxis / 2, cy + yAxis / 2))
    corners.map { case (x, y) =>
      (midx + (x * cos - y * sin), midy + (x * sin + y * cos))
    }
  }

  /** Minimum enclosing circle of a (small) point set — the Welzl result
    * (smallest_enclosing_circle.rs) computed by exhaustive candidates over
    * the CONVEX HULL vertices: the optimal centre is a pair midpoint or a
    * triple circumcentre of hull points; for each candidate the covering
    * radius is max point distance (computed, never compared with a
    * tolerance), and the lexicographic-min (r², cx, cy) candidate wins —
    * deterministic, and textually twinned by the DuckDB oracle
    * (HardOracles.circleSql). Returns (cx, cy, r²). */
  def minEnclosingCircle(h: Array[(Double, Double)]): (Double, Double, Double) = {
    val n = h.length
    if (n == 1) return (h(0)._1, h(0)._2, 0.0)
    var bestR2 = Double.PositiveInfinity
    var bestCx = 0.0; var bestCy = 0.0
    def consider(cx: Double, cy: Double): Unit = {
      var r2 = 0.0
      var i = 0
      while (i < n) {
        val dx = h(i)._1 - cx; val dy = h(i)._2 - cy
        val d = dx * dx + dy * dy
        if (d > r2) r2 = d
        i += 1
      }
      if (r2 < bestR2 || (r2 == bestR2 && (cx < bestCx || (cx == bestCx && cy < bestCy)))) {
        bestR2 = r2; bestCx = cx; bestCy = cy
      }
    }
    for (i <- 0 until n) consider(h(i)._1, h(i)._2)
    for (i <- 0 until n; j <- i + 1 until n)
      consider((h(i)._1 + h(j)._1) / 2.0, (h(i)._2 + h(j)._2) / 2.0)
    for (i <- 0 until n; j <- i + 1 until n; k <- j + 1 until n) {
      val (ax, ay) = h(i); val (bx, by) = h(j); val (cx, cy) = h(k)
      val d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
      if (d != 0.0) {
        val ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay) +
          (cx * cx + cy * cy) * (ay - by)) / d
        val uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx) +
          (cx * cx + cy * cy) * (bx - ax)) / d
        consider(ux, uy)
      }
    }
    (bestCx, bestCy, bestR2)
  }

  /** Per-feature minimum bounding circle over the distributed hull
    * (bounded merge side, like featureHulls). Output: (fid, ccx, ccy, cr). */
  def featureCircles(spark: SparkSession, pts: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = pts.select(col("fid").cast("int"), col("x"), col("y"))
      .as[(Int, Double, Double)]
    val local = typed.mapPartitions { it =>
      val Cap = 512
      val bufs = scala.collection.mutable.LinkedHashMap
        .empty[Int, scala.collection.mutable.ArrayBuffer[(Double, Double)]]
      it.foreach { case (fid, x, y) =>
        val b = bufs.getOrElseUpdate(fid, scala.collection.mutable.ArrayBuffer.empty)
        b += ((x, y))
        if (b.length >= Cap) { val h = convexHull(b.toArray); b.clear(); b ++= h }
      }
      bufs.iterator.flatMap { case (fid, b) =>
        convexHull(b.toArray).iterator.map(p => (fid, p._1, p._2))
      }
    }
    local.groupByKey(_._1).mapGroups { (fid, it) =>
      val hull = convexHull(it.map(r => (r._2, r._3)).toArray)
      val (cx, cy, r2) = minEnclosingCircle(hull)
      (fid, cx, cy, math.sqrt(r2))
    }.toDF("fid", "ccx", "ccy", "cr")
  }

  /** Distributed per-feature hull: local hull per partition, merged hull of
    * hulls per feature. Input: (fid, x, y). Output: (fid, hull_n, hull_area,
    * mbb_area). */
  def featureHulls(spark: SparkSession, pts: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = pts.select(col("fid").cast("int"), col("x"), col("y"))
      .as[(Int, Double, Double)]
    val local = typed.mapPartitions { it =>
      // Streaming accumulation: per-fid buffer compacted to its own hull
      // whenever it reaches Cap, so task state is O(#fids-in-partition ×
      // Cap) regardless of input rows (hull(hull(S) ∪ T) = hull(S ∪ T)).
      val Cap = 512
      val bufs = scala.collection.mutable.LinkedHashMap
        .empty[Int, scala.collection.mutable.ArrayBuffer[(Double, Double)]]
      it.foreach { case (fid, x, y) =>
        val b = bufs.getOrElseUpdate(fid, scala.collection.mutable.ArrayBuffer.empty)
        b += ((x, y))
        if (b.length >= Cap) { val h = convexHull(b.toArray); b.clear(); b ++= h }
      }
      bufs.iterator.flatMap { case (fid, b) =>
        convexHull(b.toArray).iterator.map(p => (fid, p._1, p._2))
      }
    }
    local.groupByKey(_._1).mapGroups { (fid, it) =>
      val hull = convexHull(it.map(r => (r._2, r._3)).toArray)
      val xs = hull.map(_._1) :+ hull.head._1
      val ys = hull.map(_._2) :+ hull.head._2
      val area = graft.expr.GeometryKernels.polygonArea(xs, ys)
      val mbb = minimumBoundingBox(hull)
      val mxs = mbb.map(_._1) :+ mbb.head._1
      val mys = mbb.map(_._2) :+ mbb.head._2
      val mbbArea = graft.expr.GeometryKernels.polygonArea(mxs, mys)
      (fid, hull.length, area, mbbArea)
    }.toDF("fid", "hull_n", "hull_area", "mbb_area")
  }
}
