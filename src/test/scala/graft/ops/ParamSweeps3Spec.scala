package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-parameter invariants for sweep batch 3 + the Sibson gates —
  * laws that relate different parameter points (or different tools over
  * the same frame), which no single-point DuckDB twin can see.
  */
class ParamSweeps3Spec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("snap radius 4 reaches at-least-as-high flow accumulation as radius 2") {
    val fa = Dem.fa(spark, dir)
    def snappedFa(name: String) = q(name)
      .selectExpr("pid", "sx AS ix", "sy AS iy")
      .join(fa, Seq("ix", "iy"))
      .selectExpr("pid", "fa AS f")
    val r2 = snappedFa("snap_pour_points").withColumnRenamed("f", "f2")
    val r4 = snappedFa("snap_pour_points_r4").withColumnRenamed("f", "f4")
    val j = r2.join(r4, "pid")
    assert(j.count() == 3, "all three gauges must snap at both radii")
    assert(j.filter(col("f4") < col("f2")).isEmpty,
      "a wider snap window can only find an equal-or-higher fa maximum")
    assert(q("snap_pour_points_r4").exceptAll(q("snap_pour_points")).count() > 0,
      "radius 4 must move at least one gauge (else the sweep point is vacuous)")
  }

  test("coarser lidar thinning keeps fewer (or equal) points, and strictly fewer here") {
    val fine = q("lidar_thin").count()
    val coarse = q("lidar_thin_res025").count()
    assert(coarse > 0 && fine > 0)
    assert(coarse < fine,
      s"doubling the cell side must merge some cells on this corpus ($coarse vs $fine)")
  }

  test("nearest-neighbour resample covers the identical fine-cell set at every factor") {
    // every non-empty res-7 cell's pages are inside its res-5 AND res-4
    // parents, so both factor re-keyings must emit exactly the fine grid,
    // and the parent count can never be below the child count
    val f4 = q("resample_nn").select("ix", "iy")
    val f8 = q("resample_nn_f8").select("ix", "iy")
    assert(f4.exceptAll(f8).isEmpty && f8.exceptAll(f4).isEmpty,
      "factor 4 and factor 8 must cover the same fine cells")
    val under = q("resample_nn_f8").as("a")
      .join(Raster.density(spark, dir, 7).as("c"), Seq("ix", "iy"))
      .filter(col("a.v") < col("c.v"))
    assert(under.isEmpty, "a parent cell count can never undercut its child's")
  }

  test("sibson: values are convex in the site values and lattices agree where they meet") {
    val sites = Raster.density(spark, dir, 6).filter("v >= 2")
    val Array(mn, mx) = sites.agg(min("v"), max("v")).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    val out = q("sibson_interpolation")
    assert(out.count() > 50, "lattice must be non-trivial")
    assert(out.filter(col("v_micro") < lit(mn * 1000000L) ||
        col("v_micro") > lit(mx * 1000000L)).isEmpty,
      "natural-neighbour interpolation is a convex combination of site values")
    // lattice points shared by the q5 and q3 strides (qx ≡ qy ≡ 2 mod 15)
    // must carry identical values — the stride only selects, never changes
    val shared5 = out.filter("qx % 15 = 2 AND qy % 15 = 2")
    val shared3 = q("sibson_interpolation_q3").filter("qx % 15 = 2 AND qy % 15 = 2")
    assert(shared5.count() > 0, "the two lattices must intersect on this extent")
    assert(shared5.exceptAll(shared3).isEmpty && shared3.exceptAll(shared5).isEmpty,
      "shared lattice points must interpolate identically at both strides")
  }

  test("sibson: a query adjacent to an isolated far site is dominated by it") {
    // for each query, its nearest site must carry the (weakly) largest
    // captured-cell weight is NOT generally true; the weaker sound law:
    // every query's neighbour set includes its euclidean-nearest site
    val sites = Raster.density(spark, dir, 6).filter("v >= 2")
      .selectExpr("ix AS sx", "iy AS sy")
    val out = q("sibson_interpolation").select("qx", "qy")
    val nearest = out.crossJoin(sites)
      .withColumn("d2", expr("(qx - sx) * (qx - sx) + (qy - sy) * (qy - sy)"))
      .groupBy("qx", "qy").agg(min("d2").as("nd2"))
    // nn >= 1 always (q steals its own cell from the nearest site), and
    // the captured region is non-empty exactly because nd2 >= 1
    assert(nearest.filter("nd2 < 1").isEmpty,
      "site-coincident lattice points are excluded by contract")
    assert(q("sibson_interpolation").filter("nn < 1").isEmpty)
  }
}
