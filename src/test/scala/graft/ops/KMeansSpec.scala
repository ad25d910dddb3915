package graft.ops

import graft.SparkSpec

class KMeansSpec extends SparkSpec {

  private def scalarKMeans(pts: Seq[(Long, Double, Double)], k: Int,
                           rounds: Int): Map[Long, Int] = {
    var centres = pts.sortBy(_._1).take(k).zipWithIndex
      .map { case ((_, x, y), i) => (i, x, y) }
    def nearest(x: Double, y: Double): Int = {
      var best = 0; var bd = Double.MaxValue
      centres.foreach { case (c, cx, cy) =>
        val d = (x - cx) * (x - cx) + (y - cy) * (y - cy)
        if (d < bd) { bd = d; best = c }
      }
      best
    }
    (0 until rounds).foreach { _ =>
      val groups = pts.groupBy(p => nearest(p._2, p._3))
      centres = centres.map { case (c, cx, cy) =>
        groups.get(c) match {
          case Some(g) => (c, g.map(_._2).sum / g.size, g.map(_._3).sum / g.size)
          case None    => (c, cx, cy)
        }
      }
    }
    pts.map(p => p._1 -> nearest(p._2, p._3)).toMap
  }

  test("distributed Lloyd rounds match the scalar loop (3 blobs)") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val pts = (0 until 600).map { i =>
      val blob = i % 3
      (i.toLong, blob * 30.0 + rnd.nextDouble() * 5, blob * 20.0 + rnd.nextDouble() * 5)
    }
    val got = KMeans.kmeans(spark, pts.toDF("id", "x", "y"), k = 3, rounds = 8)
      .as[(Long, Double, Double, Int)].collect()
      .map(r => r._1 -> r._4).toMap
    val expected = scalarKMeans(pts, 3, 8)
    // cluster labels and membership must agree exactly (same init, same ties)
    assert(got === expected)
    assert(got.values.toSet.size === 3)
  }
}
