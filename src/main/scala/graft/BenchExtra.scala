package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round measurement harness (guide §1): NOT part of the
  * driver contract — Bench.scala stays the frozen methodology. This main
  * replays Bench part 1's exact session + warmup + count() action on a
  * chosen query list, reports build/cold/warm timings per query, and dumps
  * `.explain("formatted")` to a plans directory so plan-shape claims in
  * OPTIMIZATION_r06.md are checkable.
  *
  * Usage: runMain graft.BenchExtra [q1,q2,...] [plansDir] [suffix]
  *   - cold  = first count() in the session after the cell_encode warmup
  *             (what Bench part 1 measures, incl. codegen for that plan)
  *   - warm2/warm3 = re-built query counted again (plan re-build + exec,
  *             codegen cache hot) — separates JIT/codegen from plan cost.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val suiteMode = args.nonEmpty && args(0) == "suite"
    val names: Seq[String] =
      if (suiteMode) SparkEntry.queries.keys.toSeq.sorted
      else if (args.nonEmpty && args(0).nonEmpty && args(0) != "all" && args(0) != "''")
        args(0).split(",").toSeq
      else Bench.headline
    val plansDir = if (args.length > 1) Some(args(1)) else None
    val suffix = if (args.length > 2) args(2) else "before"

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try SparkEntry.queries("cell_encode")(spark, sfDir).count()
    catch { case _: Throwable => }

    plansDir.foreach(d => new java.io.File(d).mkdirs())
    println(f"${"query"}%-28s ${"build"}%8s ${"cold"}%8s ${"warm2"}%8s ${"warm3"}%8s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      plansDir.foreach { d =>
        val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/${name}_$suffix.txt"), plan)
      }
      val t1 = System.nanoTime()
      // headline mode mirrors Bench (count); suite mode uses the noop sink
      // (guide §1.4) so every column is computed, like Verify's write.
      if (suiteMode) df.write.format("noop").mode("overwrite").save()
      else df.count()
      val cold = (System.nanoTime() - t1) / 1e9
      // post-execution (AQE-final) plan: shows ReusedExchange / skew-split
      // decisions the static explain cannot (guide §7.2). toRdd executes
      // the df's OWN query execution so its AdaptiveSparkPlan finalizes.
      if (!suiteMode) plansDir.foreach { d =>
        val qe = df.queryExecution
        qe.toRdd.foreach(_ => ())
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/${name}_${suffix}_executed.txt"),
          qe.executedPlan.toString)
      }
      def rerun(): Double = {
        val t = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t) / 1e9
      }
      // suite mode (hundreds of queries): cold-only, one line per query
      val (w2, w3) = if (suiteMode) (0.0, 0.0) else (rerun(), rerun())
      println(f"$name%-28s $tBuild%8.3f $cold%8.3f $w2%8.3f $w3%8.3f")
    }
    spark.stop()
  }
}
