package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KMeansClustering (image_analysis/k_means_clustering.rs:81-101):
  * iterative Lloyd loop as aggregate rounds.
  *
  * Deterministic by construction (the reference seeds from the data too):
  * initial centres are the k first points in (id) order; assignment ties
  * break on the lower cluster index (scan order). Each round is one
  * map-side nearest-centre assignment (centres broadcast as literals —
  * k is small) plus one hash aggregate; the driver holds only k centres.
  * Fixed round count keeps plans static; convergence typically earlier.
  */
object KMeans {

  case class Centre(c: Int, x: Double, y: Double)

  def kmeans(spark: SparkSession, pts: DataFrame, k: Int,
             rounds: Int = 10): DataFrame = {
    import spark.implicits._
    val data = pts.select(col("id"), col("x"), col("y")).cache()
    var centres: Seq[Centre] = data.orderBy("id").limit(k)
      .as[(Long, Double, Double)].collect()
      .zipWithIndex.map { case ((_, x, y), i) => Centre(i, x, y) }.toSeq

    def assignExpr(cs: Seq[Centre]): org.apache.spark.sql.Column = {
      import graft.core.Lit.{d => L}
      // nearest centre, ties → lowest index (strict < scan)
      val d2 = cs.map(c => s"((x - ${L(c.x)}) * (x - ${L(c.x)}) + (y - ${L(c.y)}) * (y - ${L(c.y)}))")
      val dmin = d2.mkString("least(", ", ", ")")
      val cases = cs.zip(d2).map { case (c, d) => s"WHEN $d = ($dmin) THEN ${c.c}" }
      expr(s"CASE ${cases.mkString(" ")} END")
    }

    var r = 0
    while (r < rounds) {
      val assigned = data.withColumn("c", assignExpr(centres))
      val updated = assigned.groupBy("c")
        .agg(avg("x").as("x"), avg("y").as("y"))
        .as[(Int, Double, Double)].collect()
        .map { case (c, x, y) => c -> Centre(c, x, y) }.toMap
      // an empty cluster keeps its previous centre so k stays fixed for
      // every later round (the reference Lloyd loop never drops a class)
      centres = centres.map(c => updated.getOrElse(c.c, c))
      r += 1
    }
    val out = data.withColumn("c", assignExpr(centres)).select("id", "x", "y", "c")
    data.unpersist()
    out
  }

  /** ModifiedKMeansClustering (image_analysis/modified_k_means_clustering
    * .rs:30-31,80-110): start from MORE clusters and merge cluster
    * centres separated by less than the merger distance after each
    * Lloyd round. Deterministic merge rule (the reference's greedy
    * pair scan re-expressed order-free): a centre is dropped when any
    * LOWER-indexed surviving centre lies within the merger distance;
    * its points reassign on the next assignment pass. */
  def kmeansMerged(spark: SparkSession, pts: DataFrame, k0: Int,
                   rounds: Int, mergeD2: Double): DataFrame = {
    import spark.implicits._
    val data = pts.select(col("id"), col("x"), col("y")).cache()
    var centres: Seq[Centre] = data.orderBy("id").limit(k0)
      .as[(Long, Double, Double)].collect()
      .zipWithIndex.map { case ((_, x, y), i) => Centre(i, x, y) }.toSeq

    def assignExpr(cs: Seq[Centre]): org.apache.spark.sql.Column = {
      import graft.core.Lit.{d => L}
      val d2 = cs.map(c => s"((x - ${L(c.x)}) * (x - ${L(c.x)}) + (y - ${L(c.y)}) * (y - ${L(c.y)}))")
      val dmin = d2.mkString("least(", ", ", ")")
      val cases = cs.zip(d2).map { case (c, d) => s"WHEN $d = ($dmin) THEN ${c.c}" }
      expr(s"CASE ${cases.mkString(" ")} END")
    }
    def merge(cs: Seq[Centre]): Seq[Centre] =
      cs.filter(c => !cs.exists(o => o.c < c.c &&
        (o.x - c.x) * (o.x - c.x) + (o.y - c.y) * (o.y - c.y) < mergeD2))

    var r = 0
    while (r < rounds) {
      val assigned = data.withColumn("c", assignExpr(centres))
      val updated = assigned.groupBy("c")
        .agg(avg("x").as("x"), avg("y").as("y"))
        .as[(Int, Double, Double)].collect()
        .map { case (c, x, y) => c -> Centre(c, x, y) }.toMap
      centres = merge(centres.map(c => updated.getOrElse(c.c, c)))
      r += 1
    }
    val out = data.withColumn("c", assignExpr(centres)).select("id", "x", "y", "c")
    data.unpersist()
    out
  }
}
