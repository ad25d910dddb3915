package graft.tools

import org.apache.spark.sql.SparkSession

/** Flagship A/B probe (optimization round measurement only): times
  * Bench.flagship over an existing generated corpus at local[N], M passes,
  * printing per-pass pages/sec. Corpus is generated once via PageGen.ensure
  * when missing. Usage: FlagshipProbe [nPages] [cores] [passes] [parts]
  */
object FlagshipProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 64000000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val passes = if (args.length > 2) args(2).toInt else 3
    val parts = if (args.length > 3) args(3).toInt else math.max(64, (n / 500000).toInt)
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/bench_data")
    val spark = SparkSession.builder()
      .master(s"local[$cores]").appName("flagship-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = graft.io.PageGen.ensure(spark, benchDir, n, parts)
    val warm = graft.io.PageGen.ensure(spark, benchDir, math.max(n / 20, 1000), 64)
    graft.Bench.flagship(spark, warm, s"$benchDir/probe_warm_${System.nanoTime()}")
    spark.read.parquet(corpus).limit(1).count()
    (1 to passes).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      graft.Bench.flagship(spark, corpus, s"$benchDir/probe_${System.nanoTime()}")
      val pps = n / ((System.nanoTime() - t0) / 1e9)
      println(f"[flagship-probe] pass $i: $pps%.0f pages/sec")
    }
    spark.stop()
  }
}
