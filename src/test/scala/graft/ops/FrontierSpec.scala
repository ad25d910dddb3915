package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** In-engine identities for the alternate-schedule gates: the oracle
  * proves each variant against DuckDB independently; these pin the
  * Spark-side pairs directly against each other (schedule changes the
  * work, never the value) plus the threshold-subset law the per-point
  * twins cannot see. All at sf0.001.
  */
class FrontierSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("wavefront flow accumulation equals the Jacobi fixpoint row-for-row") {
    val j = q("d8_flow_accum")
    val f = q("d8_flow_accum_frontier")
    assert(j.count() > 0)
    assert(j.exceptAll(f).isEmpty && f.exceptAll(j).isEmpty,
      "frontier schedule must reach the identical accumulation surface")
  }

  test("frontier Bellman-Ford equals the Jacobi cost surface bit-for-bit") {
    val j = q("cost_distance")
    val f = q("cost_distance_frontier")
    assert(j.count() > 0)
    // exceptAll compares doubles exactly — bit-identity, not tolerance
    assert(j.exceptAll(f).isEmpty && f.exceptAll(j).isEmpty,
      "min over identical left-to-right path sums must be exact")
  }

  test("euclidean distance is invariant to the coarse bucket side B") {
    val b8 = q("euclidean_distance")
    val b4 = q("euclidean_distance_b4")
    assert(b8.count() > 0)
    assert(b8.exceptAll(b4).isEmpty && b4.exceptAll(b8).isEmpty,
      "B is a work knob, never a value knob — the kr bound must cover both")
  }

  test("sparser sources only increase every cell's nearest-source distance") {
    val dflt = q("euclidean_distance").withColumnRenamed("d2", "d2a")
    val sparse = q("euclidean_distance_sparse").withColumnRenamed("d2", "d2b")
    val j = dflt.join(sparse, Seq("ix", "iy"))
    assert(j.filter(col("d2b") < col("d2a")).count() == 0,
      "shrinking the source set cannot bring any cell closer to a source")
    assert(j.filter(col("d2b") > col("d2a")).count() > 0, "sweep must not be vacuous")
  }

  test("simhash pairs at hamming<=2 are exactly the <=2 subset of <=3") {
    val h3 = q("dedup_simhash_pairs")
    val h2 = q("dedup_simhash_pairs_h2")
    assert(h2.count() > 0, "h2 sweep point must not be vacuous")
    val expect = h3.filter(col("hamming") <= 2)
    assert(h2.exceptAll(expect).isEmpty && expect.exceptAll(h2).isEmpty,
      "tightening the verify threshold must only filter the candidate set")
    assert(h3.count() > h2.count(), "fixture must exercise hamming = 3 pairs")
  }
}
