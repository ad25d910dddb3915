package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit hot-key skew handling (north rule: "explicit salting for hot
  * cells — dense urban / URL-skewed shards").
  *
  * Two tools, both deterministic (salts derive from row hashes, not RNG):
  *
  *   - saltedJoin: fan the small side out `nSalts`× and split the big
  *     side's hot keys across salts, so one hot cell's rows spread over
  *     nSalts shuffle partitions instead of one straggler task. Use when
  *     the dimension side is too big to broadcast; AQE skew-split remains
  *     the backstop for residual imbalance.
  *   - saltedAggregate: two-phase aggregation (partial per (key, salt),
  *     final per key). Spark's hash aggregate already does map-side
  *     partials; this shapes the *shuffle* so a hot key's partials land on
  *     nSalts reducers — relevant for high-cardinality payload aggs
  *     (collect_list-like) where partials stay large.
  */
object Skew {

  /** Deterministic salt for a row: stable across runs and retries. */
  def saltCol(cols: Seq[Column], nSalts: Int): Column =
    pmod(hash(cols: _*), lit(nSalts))

  /** Equi-join big ⋈ small on `key`, salting the big side's rows and
    * replicating the small side to all salts. Inner join semantics. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: Seq[String],
                 nSalts: Int): DataFrame = {
    val bigS = big.withColumn("__salt",
      saltCol(big.columns.map(col).toSeq, nSalts))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    bigS.join(smallS, key :+ "__salt").drop("__salt")
  }

  /** Two-phase salted aggregation: sum-like partial aggs per (key, salt)
    * then merged per key. `partials` maps output column name → (partial
    * agg over the input, final merge over the partials). */
  def saltedAggregate(df: DataFrame, key: Seq[String], nSalts: Int,
                      partials: Map[String, (Column, String => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      saltCol(df.columns.map(col).toSeq, nSalts))
    val partial = salted.groupBy((key :+ "__salt").map(col): _*)
      .agg(partials.head._2._1.as(partials.head._1),
        partials.tail.map { case (n, (c, _)) => c.as(n) }.toSeq: _*)
    partial.groupBy(key.map(col): _*)
      .agg(partials.head._2._2(partials.head._1).as(partials.head._1),
        partials.tail.map { case (n, (_, m)) => m(n).as(n) }.toSeq: _*)
  }
}
