package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HexBinSpec extends SparkSpec {

  test("derived constants match the reference formulas (vector_hex_bin.rs:267-271)") {
    val w = 10.0
    assert(HexBin.hw(w) === 5.0)
    assert(HexBin.size(w) === 5.0 / math.cos(math.Pi / 6.0))
    assert(HexBin.height(w) === 2.0 * HexBin.size(w))
    assert(HexBin.tqh(w) === 0.75 * HexBin.height(w))
  }

  test("assignment is the true nearest centre (brute force oracle)") {
    val w = 10.0
    val (minX, minY, maxX, maxY) = (0.0, 0.0, 100.0, 100.0)
    val HW = HexBin.hw(w); val TQH = HexBin.tqh(w)
    val cy0 = maxY - HexBin.quarterH(w); val cx0 = minX + HW
    val rows = math.ceil((maxY - minY) / TQH).toLong
    def centres: Seq[(Long, Long, Double, Double)] =
      for {
        r <- 0L until rows
        cols = math.max(1L, math.ceil(((maxX - minX) + HW * (r % 2)) / w).toLong)
        c <- 0L until cols
      } yield (r, c, cx0 - HW * (r % 2) + c * w, cy0 - r * TQH)
    val rnd = new scala.util.Random(11)
    (0 until 500).foreach { _ =>
      val x = rnd.nextDouble() * 100.0; val y = rnd.nextDouble() * 100.0
      val packed = HexBin.assign(x, y, minX, minY, maxX, maxY, w)
      val (gr, gc) = (packed >> 32, packed & 0xffffffffL)
      val best = centres.minBy { case (_, _, cx, cy) =>
        (x - cx) * (x - cx) + (y - cy) * (y - cy)
      }
      assert((gr, gc) === (best._1, best._2), s"at ($x,$y)")
    }
  }

  test("expression (codegen) equals scalar assign") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val pts = (0 until 200).map(i => (i, rnd.nextDouble() * 100, rnd.nextDouble() * 100))
    val df = pts.toDF("i", "x", "y")
      .withColumn("h", HexBin.hexBin(col("x"), col("y"),
        lit(0.0), lit(0.0), lit(100.0), lit(100.0), 10.0))
    df.as[(Int, Double, Double, Long)].collect().foreach { case (_, x, y, h) =>
      assert(h === HexBin.assign(x, y, 0.0, 0.0, 100.0, 100.0, 10.0))
    }
  }
}
