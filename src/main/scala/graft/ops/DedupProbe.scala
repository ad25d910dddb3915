package graft.ops

import org.apache.spark.sql.SparkSession

/** Phase attribution probe for the dedup_minhash_lsh headline cost
  * (round-4 verdict item 8: two rounds of +18% drift needed attributing).
  * Run: `sbt "runMain graft.ops.DedupProbe"`. Round-5 finding: the
  * shingle explode + per-row md5 dominated (3.5s of 5.2s at sf0.1); the
  * 16-aggregate groupBy and the capped bucket aggregate were NOT the
  * bottleneck. Fixed by expr/MinHash.scala (single-pass signatures:
  * 2.39s → 0.31s for the signature stage).
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // warm the corpus listing
    Tables.table(s, dir, "documents").count()
    t("shingle explode + md5 (no agg)") {
      import org.apache.spark.sql.functions._
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), explode(expr(graft.core.SparkD.shingles("text"))).as("sh"))
        .withColumn("h", expr(graft.core.SparkD.md5Bits("sh", 1)))
        .selectExpr("count(h) AS c").collect().head.getLong(0)
    }
    t("signatures (16 minhash aggs)") {
      Dedup.queries("dedup_minhash_signatures")(s, dir).count()
    }
    t("full lsh") {
      Dedup.queries("dedup_minhash_lsh")(s, dir).count()
    }
    s.stop()
  }
}
