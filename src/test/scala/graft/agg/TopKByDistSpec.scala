package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKByDistSpec extends SparkSpec {

  test("bounded top-k equals window row_number result, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 20000).map { i =>
      (i % 7L, rnd.nextInt(1000) / 10.0, i.toLong) // (group, dist, id) with ties
    }
    val df = rows.toDF("g", "dist", "id").repartition(16)

    val agg = udaf(new TopKByDist(5))
    val got = df.groupBy("g")
      .agg(agg(col("dist"), col("id")).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.dist"), col("t.id"))
      .as[(Long, Double, Long)].collect().toSet

    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(r => (g, r._2, r._3)).toSeq.sortBy(t => (t._2, t._3)).take(5)
    }.toSet
    assert(got === expected)
  }

  test("state stays bounded at k entries (NMinimizer shape)") {
    val agg = new TopKByDist(3)
    val buf = (0 until 1000).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, DistId(1000.0 - i, i.toLong)))
    assert(buf.length === 3)
    assert(buf.map(_.dist).toSeq === Seq(1.0, 2.0, 3.0))
  }
}
