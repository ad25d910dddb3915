package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans of the headline queries (plan audit). */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    Seq("pip_zonal_count", "pip_zonal_count_shuffled", "knn_radius",
      "dedup_minhash_lsh", "zonal_statistics", "quantiles",
      "cumulative_distribution", "line_intersections", "ann_cosine_topk")
      .foreach { q =>
        println(s"==== $q ====")
        println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    println("==== flagship (corpus) ====")
    val pages = spark.read.parquet(
      graft.io.PageGen.ensure(spark, "/root/repo/bench_data", 1000000))
    import org.apache.spark.sql.functions._
    val p2 = pages.withColumn("__geo", graft.expr.Geocode.geocode(col("text")))
      .withColumn("lat", col("__geo").getItem(0))
      .withColumn("lon", col("__geo").getItem(1)).drop("__geo")
    val m = graft.ops.PipJoin.zoneMembership(spark, p2)
      .groupBy("fid").agg(count(lit(1)).as("n_pages"))
    println(m.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
