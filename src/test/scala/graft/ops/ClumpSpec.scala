package graft.ops

import graft.SparkSpec

/** Clump vs a scalar flood-fill transcription of clump.rs:206-233 —
  * the partition into components must be identical (label values are
  * min-cell-id rather than scan order; the grouping is what matters). */
class ClumpSpec extends SparkSpec {

  private def floodFill(cells: Map[(Long, Long), Long],
                        eight: Boolean): Map[(Long, Long), Int] = {
    val offs = (for {
      dx <- -1 to 1; dy <- -1 to 1
      if (dx, dy) != (0, 0) && (eight || dx == 0 || dy == 0)
    } yield (dx, dy)).toSeq
    val label = scala.collection.mutable.Map.empty[(Long, Long), Int]
    var next = 0
    cells.keys.toSeq.sorted.foreach { start =>
      if (!label.contains(start)) {
        next += 1
        val stack = scala.collection.mutable.Stack(start)
        label(start) = next
        while (stack.nonEmpty) {
          val (x, y) = stack.pop()
          offs.foreach { case (dx, dy) =>
            val nb = (x + dx, y + dy)
            if (!label.contains(nb) && cells.contains(nb) &&
                cells(nb) == cells((x, y))) {
              label(nb) = next
              stack.push(nb)
            }
          }
        }
      }
    }
    label.toMap
  }

  private def partition[K, L](m: Map[K, L]): Set[Set[K]] =
    m.groupBy(_._2).values.map(_.keySet).toSet

  test("clump partition equals scalar flood fill (two values, L-shapes, diagonals)") {
    import spark.implicits._
    // deterministic blobby grid: value = (ix/3 + iy/2) % 2 over a 14x10
    // window with gaps
    val cells = (for {
      ix <- 0L until 14L; iy <- 0L until 10L
      if (ix + iy) % 7 != 0 // punch holes
    } yield ((ix, iy), (ix / 3 + iy / 2) % 2)).toMap

    val grid = cells.toSeq.map { case ((x, y), v) => (x, y, v) }.toDF("ix", "iy", "v")
    Seq(true, false).foreach { eight =>
      val got = Clump.clump(spark, grid, eightConnexity = eight)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._4).toMap
      val expected = floodFill(cells, eight)
      assert(got.keySet === expected.keySet)
      assert(partition(got) === partition(expected), s"eight=$eight")
    }
  }
}
