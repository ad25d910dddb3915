package graft.expr

import graft.SparkSpec
import graft.core.SparkD
import org.apache.spark.sql.functions._

/** Pins the single-pass MinHashExpr against the exploded twin-SQL form
  * (the DuckDB oracle's semantics) on every sf0.001 document. */
class MinHashSpec extends SparkSpec {

  test("MinHashExpr equals the exploded twin-SQL minhash per document") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text")
    val viaExpr = docs
      .select(col("doc_id"), MinHash.minhash16(col("text")).as("mh"))
      .selectExpr(("doc_id" +: (0 until 16).map(j => s"mh[$j] AS m$j")): _*)
    val h = SparkD.md5Bits("sh", 1)
    val aggs = (0 until 16).map(j =>
      s"min((($h) * ${2 * j + 1} + $j * 2654435761) % 4294967296) AS m$j")
    val viaSql = docs
      .select(col("doc_id"), explode(expr(SparkD.shingles("text"))).as("sh"))
      .groupBy("doc_id").agg(expr(aggs.head).as("m0"), aggs.tail.map(expr): _*)
    assert(viaExpr.count() === viaSql.count())
    assert(viaExpr.exceptAll(viaSql).isEmpty && viaSql.exceptAll(viaExpr).isEmpty)
  }
}
