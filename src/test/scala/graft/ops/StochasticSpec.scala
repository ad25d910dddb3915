package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the stochastic depression analysis against its design contract:
  *
  *   - pdep is a probability over exactly K=4 realizations: dep_count in
  *     0..4, pdep = dep_count/4, one row per grid cell;
  *   - every cell of every realization that the base (unperturbed) fill
  *     marks as depression-free can still flip — each realization's
  *     depression set is non-empty and ~350/2304 cells (the calibrated
  *     amplitude), not degenerate (all or none);
  *   - determinism: two evaluations agree cell-by-cell (md5 fields, no
  *     RNG state).
  */
class StochasticSpec extends SparkSpec {

  test("pdep is a bounded per-cell probability with non-degenerate mass") {
    val dir = sf("sf0.001")
    val out = SparkEntryAccess.query("stochastic_depression_analysis", spark, dir)
      .cache()
    assert(out.count() === Dem.G.toLong * Dem.G)
    assert(out.filter(expr("dep_count < 0 OR dep_count > 4")).count() === 0)
    assert(out.filter(expr("abs(pdep * 4 - dep_count) > 0")).count() === 0)
    val n = out.filter(col("dep_count") > 0).count()
    // calibrated: each realization yields ~350 depression cells; their
    // union sits strictly between "none" and "everything"
    assert(n > 100 && n < Dem.G.toLong * Dem.G / 2, s"union depression cells = $n")
    out.unpersist()
  }

  test("deterministic across evaluations") {
    val dir = sf("sf0.001")
    val a = SparkEntryAccess.query("stochastic_depression_analysis", spark, dir)
    val b = SparkEntryAccess.query("stochastic_depression_analysis", spark, dir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
