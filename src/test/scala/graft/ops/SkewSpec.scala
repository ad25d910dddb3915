package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin equals plain join on skewed data and spreads the hot key") {
    import spark.implicits._
    // 90% of rows share one hot key (the urban-cell shape)
    val big = (0 until 20000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong)).toDF("k", "payload")
    val small = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "tag")

    val plain = big.join(small, Seq("k")).select("k", "payload", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), nSalts = 8)
      .select("k", "payload", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)

    // the hot key's rows really land on multiple salts
    val saltSpread = big.filter($"k" === 42L)
      .withColumn("s", Skew.saltCol(big.columns.map(col).toSeq, 8))
      .select("s").distinct().count()
    assert(saltSpread > 4, s"hot key only used $saltSpread salts")
  }

  test("saltedAggregate equals plain aggregation") {
    import spark.implicits._
    val df = (0 until 10000).map(i => (i.toLong % 5, i.toLong)).toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Skew.saltedAggregate(df, Seq("k"), 16, Map(
      "s" -> (sum("v"), (c: String) => sum(col(c))),
      "n" -> (count(lit(1)), (c: String) => sum(col(c))),
      "mx" -> (max("v"), (c: String) => max(col(c)))))
      .select("k", "s", "n", "mx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted === plain)
  }
}
