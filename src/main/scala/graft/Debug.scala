package graft

import graft.ops.{PipJoin, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics main (not part of the driver contract). */
object Debug {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val pages = Tables.pages(spark, dir)
    time("pages.count")(println(pages.count()))
    val m = PipJoin.zoneMembership(spark, pages)
    time("membership.count")(println(m.count()))
    val keep = m.filter(col("fid") === 3).select("doc_id")
    val erase = pages.join(keep, Seq("doc_id"), "left_anti")
      .select("doc_id", "url", "text").orderBy("doc_id")
    time("erase.count")(println(erase.count()))
    erase.explain("formatted")
    spark.stop()
  }
}
