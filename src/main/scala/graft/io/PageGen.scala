package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic page corpus for the throughput bench
  * (FIXTURES.md §9 — bench only, never used for correctness assertions).
  *
  * Schema matches the input_hint shape: url, warc_ts, html (binary),
  * text, lang. Text is a pure function of the row id (seeded token
  * selection — no RNG state), so the corpus is identical across runs and
  * parallelism levels. Geocoding happens in the measured job, not here.
  */
object PageGen {
  private val words = Seq("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "merge", "batch", "index", "page",
    "query", "join", "shard", "block", "cache", "tile")

  /** words expression: deterministic pseudo-random token sequence. */
  private def textExpr: String = {
    // 24 tokens chosen by mixing the row id with a splitmix-style hash,
    // plus the id itself for uniqueness (controls duplicate rate ~0).
    val toks = (0 until 24).map { i =>
      val arr = words.map(w => s"'$w'").mkString("array(", ", ", ")")
      s"element_at($arr, cast((id * 2654435761 + $i * 40503) % 20 as int) + 1)"
    }
    s"concat_ws(' ', 'doc', cast(id as string), ${toks.mkString(", ")})"
  }

  def generate(spark: SparkSession, n: Long): DataFrame =
    spark.range(n)
      .withColumn("text", expr(textExpr))
      .withColumn("url", expr(
        "'https://site-' || cast(id % 997 as string) || '.example/p/' || cast(id as string)"))
      .withColumn("warc_ts", expr(
        "timestampadd(SECOND, cast(id % 31536000 as int), timestamp'2024-01-01 00:00:00')"))
      .withColumn("html", expr(
        "encode('<html><body>' || text || '</body></html>', 'UTF-8')"))
      .withColumn("lang", expr(
        "element_at(array('en','de','fr','zh','es'), cast(id % 5 as int) + 1)"))
      .select(expr("id").as("doc_id"), col("url"), col("warc_ts"),
        col("html"), col("text"), col("lang"),
        expr("cast(length(text) as bigint)").as("n_chars"))

  /** Materialise once under dir (idempotent). Returns the path.
    *
    * 256 files, not 64: each ~14 MB file is one parquet row group = one
    * scan task, so local[32] runs 8 waves (stragglers amortize) instead
    * of 2 (one slow task = up to +50% tail). The path encodes the layout
    * so older corpora are never silently reused. */
  def ensure(spark: SparkSession, dir: String, n: Long, parts: Int = 256): String = {
    val path = s"$dir/pages_${n}_p$parts"
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.exists()) {
      generate(spark, n)
        .repartition(parts)
        // zstd like any production web corpus: ~2× smaller than snappy,
        // and the scan stays compute-bound instead of saturating the
        // single-box memory bus at local[32]
        .write.mode("overwrite").option("compression", "zstd").parquet(path)
    }
    path
  }
}
