package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-parameter invariants of the ParamSweeps2 gates (batch 2) —
  * relations BETWEEN parameter values that the per-point DuckDB twins
  * cannot see. All run at sf0.001.
  */
class ParamSweeps2Spec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("slope zfactor=2 steepens every non-flat cell, flat cells stay flat") {
    val z1 = q("slope").select(col("ix"), col("iy"), col("slope_deg").as("s1"))
    val z2 = q("slope_zfactor2").select(col("ix"), col("iy"), col("slope_deg").as("s2"))
    val j = z1.join(z2, Seq("ix", "iy"))
    assert(j.count() > 0)
    // atan is strictly increasing: s2 > s1 wherever s1 > 0, s2 = 0 iff s1 = 0
    assert(j.filter(col("s1") > 0.0 && col("s2") <= col("s1")).count() == 0,
      "zf=2 must strictly steepen every non-flat cell")
    assert(j.filter(col("s1") === 0.0 && col("s2") =!= 0.0).count() == 0,
      "flat cells must stay flat under any zfactor")
    assert(j.filter(col("s2") > col("s1")).count() > 0, "sweep must not be vacuous")
  }

  test("quantile bins are monotone in the ranked attribute at both k") {
    for (name <- Seq("quantiles", "quantiles_q10")) {
      val perBin = q(name).groupBy("bin")
        .agg(min(col("n_chars").cast("long")).as("lo"),
          max(col("n_chars").cast("long")).as("hi"))
        .orderBy("bin").collect()
      assert(perBin.nonEmpty)
      perBin.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(2) <= b.getLong(1),
            s"$name: bin value ranges must be ordered without overlap (${a} vs ${b})")
        case _ =>
      }
    }
    val k10bins = q("quantiles_q10").select("bin").distinct().count()
    assert(k10bins > 4, s"k=10 must spread beyond the k=4 bin count (got $k10bins)")
  }

  test("hex width sweep conserves point mass and refines the partition") {
    val w10 = q("hex_binning").agg(sum("n")).first().getLong(0)
    val w5 = q("hex_binning_w5").agg(sum("n")).first().getLong(0)
    assert(w10 == w5, "every point lands in exactly one hex at any width")
    val n10 = q("hex_binning").count(); val n5 = q("hex_binning_w5").count()
    assert(n5 > n10, s"halving the width must occupy more hexes ($n5 vs $n10)")
  }

  test("ann top-5 is exactly the rank<=5 prefix of top-10") {
    val k5 = q("ann_topk_k5")
    val prefix = q("ann_cosine_topk").filter(col("rank") <= 5)
    assert(k5.count() > 0)
    assert(k5.exceptAll(prefix).isEmpty && prefix.exceptAll(k5).isEmpty,
      "bounded top-k must be prefix-consistent across k")
  }

  test("8x2 LSH candidates are a subset of 16x1 candidates") {
    val b8 = q("dedup_minhash_lsh")
    val b16 = q("dedup_minhash_b16")
    assert(b16.count() >= b8.count(), "1-row bands collide at least as often")
    assert(b8.exceptAll(b16).isEmpty,
      "a (h1,h2) band collision implies both 1-row band collisions")
    assert(b16.count() > 0, "vacuity guard")
  }

  test("5-point smoothing keeps every vertex inside the ring's coordinate envelope") {
    // each smoothed coordinate is the mean of 5 ring elements, so it must
    // stay within [min, max] of the ring's own coordinates. (A sum-
    // preservation law does NOT hold: the wraparound rule identifies
    // vertex 1 with vertex n — the closing duplicate — so window
    // reference counts are non-uniform at the seam.)
    val env = VectorOps.ringsDF(spark)
      .select(col("fid"), col("ring_id"),
        expr("array_min(xs)").as("xlo"), expr("array_max(xs)").as("xhi"),
        expr("array_min(ys)").as("ylo"), expr("array_max(ys)").as("yhi"))
    val bad = q("smooth_vectors_f5").join(env, Seq("fid", "ring_id"))
      .filter(col("sx") < col("xlo") - lit(1e-9) || col("sx") > col("xhi") + lit(1e-9) ||
        col("sy") < col("ylo") - lit(1e-9) || col("sy") > col("yhi") + lit(1e-9))
      .count()
    assert(bad == 0, "a moving average cannot escape the ring's min/max envelope")
    // and it must differ from the 3-point result somewhere
    val f3 = graft.SparkEntry.queries("smooth_vectors")(spark, dir)
      .select(col("fid"), col("ring_id"), col("idx"), col("sx").as("sx3"))
    val diff = q("smooth_vectors_f5").join(f3, Seq("fid", "ring_id", "idx"))
      .filter(col("sx") =!= col("sx3")).count()
    assert(diff > 0, "filter=5 must smooth differently from filter=3")
  }

  test("extend distance sweep: endpoints move exactly (1.5 - 0.5) further out") {
    val d05 = graft.SparkEntry.queries("extend_vector_lines")(spark, dir)
      .select(col("fid"), col("ring_id"), col("x0e").as("ax0"), col("y0e").as("ay0"),
        col("xne").as("axn"), col("yne").as("ayn"))
    val d15 = q("extend_lines_d15")
      .select(col("fid"), col("ring_id"), col("x0e").as("bx0"), col("y0e").as("by0"),
        col("xne").as("bxn"), col("yne").as("byn"))
    val j = d05.join(d15, Seq("fid", "ring_id"))
      .filter(col("ax0").isNotNull && col("bx0").isNotNull)
    assert(j.count() > 0)
    val bad = j.filter(
      abs(sqrt(pow(col("bx0") - col("ax0"), 2) + pow(col("by0") - col("ay0"), 2)) - 1.0) > 1e-9 ||
        abs(sqrt(pow(col("bxn") - col("axn"), 2) + pow(col("byn") - col("ayn"), 2)) - 1.0) > 1e-9)
      .count()
    assert(bad == 0, "both ends must translate along the same unit direction by the dist delta")
  }

  test("kmeans k=3 partitions the same cells into exactly 3 clusters") {
    val k3 = q("kmeans_k3")
    val k5 = graft.SparkEntry.queries("kmeans_clustering")(spark, dir)
    assert(k3.count() == k5.count(), "both k assign every cell")
    assert(k3.select("c").distinct().count() == 3)
    assert(k5.select("c").distinct().count() == 5)
  }
}
