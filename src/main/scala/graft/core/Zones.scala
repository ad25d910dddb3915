package graft.core

/** Polygon-zone fixtures used by the spatial-join queries.
  *
  * Geometry model mirrors the reference Shapefile record
  * (/root/reference/src/vector/shapefile/geometry.rs:13-30): a feature is a
  * list of rings (parts); outer rings are hulls, counter-clockwise rings are
  * holes; rings are explicitly closed (first == last vertex —
  * poly_ops.rs:40-44 panics otherwise).
  *
  * This object is the single source of truth: the Spark side builds a rings
  * DataFrame from it, and the oracle side generates the equivalent DuckDB
  * winding-number SQL from the very same vertex arrays, so any drift is
  * structurally impossible.
  */
final case class Ring(fid: Int, ringId: Int, isHole: Boolean,
                      xs: Array[Double], ys: Array[Double]) {
  require(xs.length == ys.length && xs.length >= 4, "ring must be closed, >=4 pts")
  require(xs.head == xs.last && ys.head == ys.last, "ring not closed")
  def minX: Double = xs.min; def maxX: Double = xs.max
  def minY: Double = ys.min; def maxY: Double = ys.max
}

object Zones {
  /** Rings are written below in drawing order; this helper re-orients them
    * to the shapefile convention (geometry.rs:291: outer rings clockwise,
    * holes counter-clockwise) by reversing when the signed shoelace area
    * disagrees with the requested role. */
  private def ring(fid: Int, rid: Int, hole: Boolean, pts: (Double, Double)*): Ring = {
    val xs = pts.map(_._1).toArray
    val ys = pts.map(_._2).toArray
    var signed = 0.0
    (0 until xs.length - 1).foreach(i => signed += xs(i) * ys(i + 1) - xs(i + 1) * ys(i))
    // CCW ⇔ signed > 0; holes must be CCW, hulls CW
    val needReverse = if (hole) signed < 0 else signed > 0
    if (needReverse) Ring(fid, rid, hole, xs.reverse, ys.reverse)
    else Ring(fid, rid, hole, xs, ys)
  }

  /** World-coordinate zones (lon = x, lat = y), chosen to overlap the
    * geocoded page distribution: three covering the uniform belt, one
    * concave, one with a hole, one multi-part, one around an urban hot
    * cell (NYC) to exercise skew. */
  val worldZones: Seq[Ring] = Seq(
    // Z1: big mid-Atlantic rectangle
    ring(1, 0, hole = false, (-60.0, -30.0), (-10.0, -30.0), (-10.0, 20.0), (-60.0, 20.0), (-60.0, -30.0)),
    // Z2: concave "L" over Asia
    ring(2, 0, hole = false, (60.0, 0.0), (120.0, 0.0), (120.0, 20.0), (90.0, 20.0), (90.0, 50.0), (60.0, 50.0), (60.0, 0.0)),
    // Z3: square with a square hole (hole ring CCW), over Africa/Europe
    ring(3, 0, hole = false, (0.0, -20.0), (40.0, -20.0), (40.0, 30.0), (0.0, 30.0), (0.0, -20.0)),
    ring(3, 1, hole = true, (10.0, -10.0), (10.0, 10.0), (30.0, 10.0), (30.0, -10.0), (10.0, -10.0)),
    // Z4: multi-part — two disjoint hulls (south Pacific, south Indian)
    ring(4, 0, hole = false, (-170.0, -50.0), (-130.0, -50.0), (-130.0, -20.0), (-170.0, -20.0), (-170.0, -50.0)),
    ring(4, 1, hole = false, (70.0, -55.0), (110.0, -55.0), (110.0, -30.0), (70.0, -30.0), (70.0, -55.0)),
    // Z5: tight box around the NYC urban anchor (hot cell; 20%/3 of pages)
    ring(5, 0, hole = false, (-74.05, 40.65), (-73.85, 40.65), (-73.85, 40.85), (-74.05, 40.85), (-74.05, 40.65)),
    // Z6: triangle over North America (non-axis-aligned edges)
    ring(6, 0, hole = false, (-120.0, 30.0), (-80.0, 30.0), (-100.0, 60.0), (-120.0, 30.0))
  )

  /** Winding-number SQL for one ring, exactly cloning the reference
    * (poly_ops.rs:40-70): for edge i→i+1,
    *   up-crossing   (y_i <= y < y_{i+1}) and point strictly left  → +1
    *   down-crossing (y_i >  y >= y_{i+1}) and point strictly right → −1
    * is_left = (x1-x0)*(y-y0) - (x-x0)*(y1-y0)   [poly_ops.rs:20-21]
    * Written identically for Spark and DuckDB (pure IEEE-754 arithmetic). */
  def windingSql(r: Ring, x: String, y: String): String = {
    import Lit.{d => L}
    val terms = (0 until r.xs.length - 1).map { i =>
      val (x0, y0, x1, y1) = (L(r.xs(i)), L(r.ys(i)), L(r.xs(i + 1)), L(r.ys(i + 1)))
      val isLeft = s"(($x1 - $x0) * (($y) - $y0) - (($x) - $x0) * ($y1 - $y0))"
      s"(CASE WHEN $y0 <= ($y) AND $y1 > ($y) AND $isLeft > 0.0e0 THEN 1 " +
        s"WHEN $y0 > ($y) AND $y1 <= ($y) AND $isLeft < 0.0e0 THEN -1 ELSE 0 END)"
    }
    terms.mkString("(", " + ", ")")
  }

  /** Parity test — point_in_poly (poly_ops.rs:29-31): wn % 2 != 0.
    * Boundary points are outside. */
  def pipSql(r: Ring, x: String, y: String): String =
    s"((${windingSql(r, x, y)}) % 2 <> 0)"

  /** Inside-zone predicate for a whole feature: inside some hull ring and
    * inside no hole ring (clip semantics: hull parts add, hole parts erase —
    * clip_raster_to_polygon.rs:231-300). */
  def insideZoneSql(fid: Int, x: String, y: String): String = {
    val rs = worldZones.filter(_.fid == fid)
    val hulls = rs.filter(!_.isHole).map(pipSql(_, x, y)).mkString("(", " OR ", ")")
    val holes = rs.filter(_.isHole).map(pipSql(_, x, y))
    if (holes.isEmpty) hulls
    else s"($hulls AND NOT ${holes.mkString("(", " OR ", ")")})"
  }

  def fids: Seq[Int] = worldZones.map(_.fid).distinct
}
