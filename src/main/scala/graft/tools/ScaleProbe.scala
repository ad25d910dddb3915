package graft.tools

import graft.io.PageGen
import graft.ops.PipJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder-side diagnostic: attributes the N→4N scaling loss by timing
  * the flagship's phases separately at both pinned core counts.
  * Phases: (a) parquet scan + length-sum (decode-bound), (b) + geocode
  * (md5-bound), (c) full flagship incl. commit. Not part of the driver
  * contract — a measurement harness only. */
object ScaleProbe {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"probe-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def pin(cores: Int): Unit = {
    val pid = ProcessHandle.current().pid()
    new ProcessBuilder("taskset", "-a", "-pc", s"0-${cores - 1}", pid.toString)
      .redirectErrorStream(true).start().waitFor()
  }

  def main(args: Array[String]): Unit = {
    val benchDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/bench_data")
    val n = sys.env.getOrElse("PROBE_N", "64000000").toLong
    val s0 = session(32)
    val corpus = PageGen.ensure(s0, benchDir, n, math.max(64, (n / 500000).toInt))
    s0.stop()

    def phases(cores: Int): Seq[(String, Double)] = {
      pin(cores)
      val s = session(cores)
      def t(name: String)(f: => Unit): (String, Double) = {
        val t0 = System.nanoTime(); f; name -> (System.nanoTime() - t0) / 1e9
      }
      // warmup small
      s.read.parquet(corpus).limit(1000).count()
      System.gc()
      val r = Seq(
        t("scan") { s.read.parquet(corpus).agg(sum(length(col("text")))).collect() },
        t("geocode") {
          s.read.parquet(corpus)
            .withColumn("__geo", graft.expr.Geocode.geocode(col("text")))
            .agg(sum(col("__geo").getItem(0))).collect()
        },
        t("flagship") {
          graft.Bench.flagship(s, corpus, s"$benchDir/probe_${cores}_${System.nanoTime()}")
        })
      s.stop()
      pin(32)
      r
    }
    val r8a = phases(8); val r32a = phases(32)
    val r8b = phases(8); val r32b = phases(32)
    def fmt(rs: Seq[(String, Double)]) = rs.map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
    println(s"PROBE n=$n")
    println(s"  8a:  ${fmt(r8a)}")
    println(s"  32a: ${fmt(r32a)}")
    println(s"  8b:  ${fmt(r8b)}")
    println(s"  32b: ${fmt(r32b)}")
    Seq(("a", r8a, r32a), ("b", r8b, r32b)).foreach { case (tag, r8, r32) =>
      val eff = r8.zip(r32).map { case ((k, t8), (_, t32)) => f"$k=${t8 / (4 * t32)}%.3f" }
      println(s"  eff4x($tag): ${eff.mkString(" ")}")
    }
  }
}
