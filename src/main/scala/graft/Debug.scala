package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics main (not part of the driver contract). */
object Debug {
  def main(args: Array[String]): Unit = {
    val corpus = "/root/repo/bench_data/pages_64000000"
    def run(cores: Int): Double = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .appName(s"dbg$cores")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      Bench.flagship(s, "/root/repo/bench_data/pages_3200000",
        s"/root/repo/bench_data/dbgw_${cores}_${System.nanoTime()}")
      val t0 = System.nanoTime()
      Bench.flagship(s, corpus, s"/root/repo/bench_data/dbg_${cores}_${System.nanoTime()}")
      val secs = (System.nanoTime() - t0) / 1e9
      s.stop()
      val pps = 64000000 / secs
      println(f"[debug] local[$cores]: $secs%.2f s, $pps%.0f pages/s")
      pps
    }
    val results = Seq(4, 16, 4, 16, 8, 32).map(c => c -> run(c))
    val best = results.groupBy(_._1).view.mapValues(_.map(_._2).max)
    println(f"[debug] eff 4->16: ${best(16) / (4 * best(4))}%.3f")
    println(f"[debug] eff 8->32: ${best(32) / (4 * best(8))}%.3f")
  }
}
