package graft.ops

import graft.{SparkEntry, SparkSpec}
import graft.core.Zones
import graft.expr.PointInPolygon

/** End-to-end PIP join vs a driver-side scalar oracle (the reference loop
  * transcribed: bbox gate + winding parity, hull adds / hole erases —
  * clip_lidar_to_polygon.rs:203-240). */
class PipJoinSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def oracleMembership(pts: Seq[(Long, Double, Double)]): Set[(Long, Int)] = {
    (for {
      (id, lon, lat) <- pts
      fid <- Zones.fids
      rs = Zones.worldZones.filter(_.fid == fid)
      inHull = rs.exists(r => !r.isHole && PointInPolygon.pointInPoly(lon, lat, r.xs, r.ys))
      inHole = rs.exists(r => r.isHole && PointInPolygon.pointInPoly(lon, lat, r.xs, r.ys))
      if inHull && !inHole
    } yield (id, fid)).toSet
  }

  test("zoneMembership matches scalar oracle on sf0.001 pages") {
    import spark.implicits._
    val pages = Tables.pages(spark, sf("sf0.001")).cache()
    val pts = pages.select("doc_id", "lon", "lat").as[(Long, Double, Double)].collect().toSeq
    val expected = oracleMembership(pts)
    val got = PipJoin.zoneMembership(spark, pages)
      .as[(Long, Int)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // hole actually exercised: some page is inside Z3's hull but excluded
    val z3hull = Zones.worldZones.find(r => r.fid == 3 && !r.isHole).get
    val inHullOnly = pts.filter { case (_, lon, lat) =>
      PointInPolygon.pointInPoly(lon, lat, z3hull.xs, z3hull.ys)
    }.map(_._1).toSet
    val kept = got.filter(_._2 == 3).map(_._1)
    assert(inHullOnly.size > kept.size, "fixture must have pages inside the Z3 hole")
  }

  test("byte-identical text through clip (input_hint invariant)") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val inBytes = Tables.table(spark, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("b"))
      .as[(Long, Array[Byte])].collect().toMap
    val clipped = SparkEntry.queries("clip_points_to_polygon")(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("b"))
      .as[(Long, Array[Byte])].collect()
    assert(clipped.nonEmpty)
    clipped.foreach { case (id, b) =>
      assert(java.util.Arrays.equals(b, inBytes(id)), s"text bytes mutated for doc $id")
    }
  }

  test("urban skew knob: ~20% of pages in 3 hot cells") {
    import spark.implicits._
    val pages = Tables.pages(spark, sf("sf0.001"))
    val withCell = PipJoin.withCell(pages, 10)
    val top3 = withCell.groupBy("cell").count().orderBy(desc("count"))
      .limit(3).as[(Long, Long)].collect().map(_._2).sum
    val total = pages.count()
    assert(top3.toDouble / total > 0.15, s"hot cells hold $top3/$total")
  }
}
