package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the exact PIP semantics to the reference's own unit tests
  * (/root/reference/src/algorithms/poly_ops.rs:150-197), on both the scalar
  * oracle and the Catalyst expression (interpreted + codegen paths). */
class PipSpec extends SparkSpec {
  // poly_ops.rs test triangle: (0,0) (5,0) (5,5) closed back to (0,0)
  private val xs = Array(0.0, 5.0, 5.0, 0.0)
  private val ys = Array(0.0, 0.0, 5.0, 0.0)

  test("scalar: reference point_in_poly vectors (poly_ops.rs:151-162)") {
    assert(PointInPolygon.pointInPoly(2.0, 2.0, xs, ys))
    assert(!PointInPolygon.pointInPoly(12.0, 12.0, xs, ys))
  }

  test("scalar: reference winding_number vectors (poly_ops.rs:164-176)") {
    assert(PointInPolygon.windingNumber(5.0, 2.0, xs, ys) === 0) // boundary → outside
    assert(PointInPolygon.windingNumber(4.0, 2.0, xs, ys) === 1)
    assert(PointInPolygon.windingNumber(6.0, 2.0, xs, ys) === 0)
  }

  test("scalar: poly_in_poly vectors (poly_ops.rs:179-197)") {
    val xs2 = Array(-1.0, 6.0, 6.0, -1.0); val ys2 = Array(-1.0, -1.0, 6.0, -1.0)
    assert((0 until xs.length).forall(i => PointInPolygon.pointInPoly(xs(i), ys(i), xs2, ys2)))
    assert(!(0 until xs2.length).forall(i => PointInPolygon.pointInPoly(xs2(i), ys2(i), xs, ys)))
  }

  test("expression agrees with scalar oracle on a point lattice (codegen path)") {
    import spark.implicits._
    val pts = for (i <- -20 to 40; j <- -20 to 40) yield (i * 0.25, j * 0.25)
    val df = pts.toDF("x", "y")
      .withColumn("xs", typedLit(xs)).withColumn("ys", typedLit(ys))
      .withColumn("inside", PointInPolygon.pip($"x", $"y", $"xs", $"ys"))
    val got = df.select("x", "y", "inside").as[(Double, Double, Boolean)].collect()
    got.foreach { case (x, y, in) =>
      assert(in === PointInPolygon.pointInPoly(x, y, xs, ys), s"at ($x,$y)")
    }
  }

  test("expression null propagation") {
    import spark.implicits._
    val df = Seq((Some(1.0), 1.0)).toDF("x", "y")
      .withColumn("xs", typedLit(xs)).withColumn("ys", typedLit(ys))
      .select(PointInPolygon.pip(lit(null).cast("double"), $"y", $"xs", $"ys").as("r"))
    assert(df.collect()(0).isNullAt(0))
  }
}
