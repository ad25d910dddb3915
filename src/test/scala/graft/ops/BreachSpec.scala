package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-5 fixpoint machinery against scalar re-derivations:
  *
  *   - breach_depressions: the carve respects the reference invariants —
  *     only non-pit cells are lowered, carved cells descend in strict
  *     milli-steps below their pit's elevation, and no cell is RAISED.
  *   - faFrontier ≡ the production Jacobi fa on the fixture pointers
  *     (the wavefront variant is the PLANS.md 100×-scale answer; its
  *     per-edge-once contract must not change the values).
  */
class BreachSpec extends SparkSpec {

  test("breach carve lowers only, in milli-steps, on the fixture") {
    val dir = sf("sf0.001")
    val out = SparkEntryAccess.query("breach_depressions", spark, dir)
    val dem = Dem.dem(spark, dir)
    val joined = out.join(dem, Seq("ix", "iy")).cache()
    // never raised
    assert(joined.filter(expr("zb_milli > z * 1000")).count() === 0)
    // carved cells exist and the carve is a strict fractional decrement
    val carved = joined.filter(expr("zb_milli < z * 1000"))
    assert(carved.count() > 0)
    assert(carved.filter(expr("zb_milli % 1000 = 0")).count() === 0)
    joined.unpersist()
  }

  test("wavefront fa equals Jacobi fa on the fixture pointers") {
    val dir = sf("sf0.001")
    val d = Dem.dd(spark, dir)
    val grid = d.select("ix", "iy")
    val edges = d.filter(col("dir") >= 0).select("ix", "iy", "tx", "ty").localCheckpoint()
    val (fw, waves) = FaScale.faFrontier(grid, edges)
    val fj = Dem.fa(spark, dir)
    assert(waves > 0)
    assert(fw.count() === fj.count())
    assert(fw.exceptAll(fj).isEmpty && fj.exceptAll(fw).isEmpty)
  }
}

/** test-side access to the package-private query registry. */
object SparkEntryAccess {
  def query(name: String, s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.SparkEntry.queries(name)(s, dir)
}
