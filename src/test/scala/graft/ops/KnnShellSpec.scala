package graft.ops

import graft.SparkSpec

/** Pins KnnShell.knn to a scalar transcription of the reference's
  * FixedRadiusSearch2D::knn_search (fixed_radius_search.rs:134-218):
  * bucket width r/2, 3×3 start block, full-shell expansion until ≥k seen,
  * k smallest squared distances, (d², id) tie order. */
class KnnShellSpec extends SparkSpec {

  private def frsKnn(points: Seq[(Long, Double, Double)],
                     qx: Double, qy: Double, k: Int, r: Double,
                     maxShell: Int = 64): Seq[(Long, Double)] = {
    val w = r * 0.5
    val buckets = points.groupBy(p =>
      (math.floor(p._2 / w).toLong, math.floor(p._3 / w).toLong))
    val qbx = math.floor(qx / w).toLong
    val qby = math.floor(qy / w).toLong
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    def scanShell(lo: Int, hi: Int): Unit =
      for {
        m <- -hi to hi; n <- -hi to hi
        s = math.max(math.abs(m), math.abs(n)) if s >= lo && s <= hi
        ps <- buckets.get((qbx + m, qby + n)).toSeq; p <- ps
      } seen += ((p._1,
        (p._2 - qx) * (p._2 - qx) + (p._3 - qy) * (p._3 - qy)))
    scanShell(0, 1) // 3×3 start block (:150-166)
    var shell = 2
    while (seen.size < k && shell <= maxShell) { scanShell(shell, shell); shell += 1 }
    seen.sortBy(p => (p._2, p._1)).take(k).toSeq
  }

  test("shell-expansion kNN matches scalar FRS transcription") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // dense cluster + sparse spread + exact duplicates (FIXTURES.md §5)
    val pts: Seq[(Long, Double, Double)] =
      (0L until 50L).map(i => (i, 10.0 + rnd.nextDouble(), 10.0 + rnd.nextDouble())) ++
      (50L until 90L).map(i => (i, rnd.nextDouble() * 100.0, rnd.nextDouble() * 100.0)) ++
      Seq((90L, 10.5, 10.5), (91L, 10.5, 10.5)) // duplicates → d² ties
    val queries = Seq((0L, 10.5, 10.5), (1L, 50.0, 50.0), (2L, 99.0, 1.0), (3L, 0.0, 99.0))

    val qDf = queries.toDF("qid", "qx", "qy")
    val pDf = pts.toDF("id", "x", "y")
    val got = KnnShell.knn(spark, qDf, pDf, k = 5, r = 4.0)
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap

    queries.foreach { case (qid, qx, qy) =>
      val expected = frsKnn(pts, qx, qy, 5, 4.0)
      assert(got(qid) === expected, s"query $qid")
    }
  }

  test("approximation pinned: a closer point in an unscanned shell is missed") {
    // query bucket holds ≥k points; a closer point sits 3 buckets away —
    // the reference (and we) never scan it once k are found in the block.
    import spark.implicits._
    val r = 2.0 // w = 1
    val pts = Seq(
      (1L, 0.1, 0.1), (2L, 0.2, 0.2), (3L, 0.3, 0.3), // in query bucket
      (4L, 900.0, 900.0)).toDF("id", "x", "y")
    val q = Seq((0L, 0.15, 0.15)).toDF("qid", "qx", "qy")
    val got = KnnShell.knn(spark, q, pts, k = 3, r = r)
      .as[(Long, Int, Long, Double)].collect().map(_._3).toSet
    assert(got === Set(1L, 2L, 3L))
  }
}
