package graft.agg

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded member collector for skew-capped bucket joins: accumulates ids
  * up to cap + 1 entries and then STOPS GROWING — a bucket that overflows
  * the cap is dropped by the consumer anyway (the LSH hot-bucket bound),
  * so per-group aggregation state is O(cap) no matter how viral the
  * bucket. Without this, collect_list on a hot bucket would buffer every
  * member before the size filter discards them.
  *
  * The ≤cap result preserves multiset semantics (order immaterial for the
  * pair explode, which normalizes with least/greatest).
  */
class CappedList(cap: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(cap > 0, "Invalid CappedList cap.")
  private val lim = cap + 1

  override def zero: Array[Long] = Array.empty

  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    if (buf.length >= lim) buf else buf :+ v

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.length >= lim) a
    else if (b.length >= lim) b
    else {
      val n = math.min(a.length + b.length, lim)
      val out = new Array[Long](n)
      System.arraycopy(a, 0, out, 0, a.length)
      System.arraycopy(b, 0, out, a.length, n - a.length)
      out
    }
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CappedList {
  /** Column form: capped(cap)(idCol) → array<bigint> (≤ cap + 1 entries;
    * length > cap means the bucket overflowed and must be dropped). */
  def capped(cap: Int)(id: Column): Column = udaf(new CappedList(cap)).apply(id)
}
