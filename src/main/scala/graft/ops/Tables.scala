package graft.ops

import graft.core.{Geo, SparkD}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Input-table access. All parquet tables of an sf dir are registered as
  * temp views; the `pages` view (BASELINE.json input_hint shape) is derived
  * deterministically from `documents` via the shared twin-SQL (Dialect.scala)
  * so that the Spark plan and the DuckDB oracle compute bit-identical
  * lat/lon/url. `text` is carried through untouched (byte-identity
  * invariant). */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Metadata memoization (guide §1/§6 "measure the overhead too"): every
  // `spark.read.parquet` call re-lists the path and re-reads the footer on
  // the DRIVER (~50-60 ms each), and `register` did that for all 10 tables
  // on EVERY Tables.pages call — ~0.6 s of pure driver time per query build
  // (measured via BenchExtra: pages-based headline queries spent
  // 0.65-1.4 s in build vs 0.13 s for the memoized-free dedup/ann paths).
  // The cache stores the lazy DataFrame (a logical plan — NO data, NO
  // results), keyed per live session so a new session never reuses plans
  // from a stopped one. Every action still scans the parquet files.
  private val dfCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  // current registered dir PER SESSION: registration must re-point the
  // views whenever the dir CHANGES (a memo keyed on (session, dir) alone
  // would silently leave views at the previous dir when a session
  // alternates fixtures — review r06), and must re-run when the session
  // changes.
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  def register(spark: SparkSession, sfDir: String): Unit =
    if (registeredDir.put(spark, sfDir) != sfDir)
      names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // single-generation eviction (the Dem.memo discipline): only the
    // current session's entries are retained, so stopped sessions' plans
    // are never pinned by the cache. The map is ≤ #tables entries, so the
    // sweep is trivial.
    dfCache.keySet.removeIf(k => k._1 ne spark)
    registeredDir.keySet.removeIf(k => k ne spark)
    dfCache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      k => k._1.read.parquet(k._2))
  }

  /** Scale-adaptive parallelism rescue for expensive per-row work (guide
    * §2.2/§2.5 "input skew: one huge unsplittable file"): the fixture
    * tables are ONE parquet file each, so a scan is ONE split and any
    * per-row digest/geometry work downstream of it runs on a single core.
    * When (and only when) the file layout yields fewer splits than the
    * session's parallelism, hash-repartition by `key` — a tiny shuffle at
    * fixture scale. At corpus scale the scan already has >= cores splits
    * and this is the identity, so the heavy payload is never shuffled
    * (guide §8: move big rows once). */
  private[ops] def spread(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    // gate on SCAN SPLITS, not file count (review r06): a corpus stored as
    // a few huge parquet files still yields many maxPartitionBytes splits,
    // and shuffling its text payload would be exactly the corpus-scale
    // regression this helper must never cause.
    val splits = df.rdd.getNumPartitions
    // explicit numPartitions: an N-less repartition(col) is a coalescable
    // shuffle under AQE, which re-merges the tiny fixture exchange back to
    // ONE partition and defeats the parallelism rescue entirely.
    if (splits >= want) df else df.repartition(want, key)
  }

  /** pages(doc_id, url, text, lang, source, n_chars, lat, lon) — geocoded
    * page corpus. The Spark plan uses the single-digest GeocodeExpr
    * (expr/Geocode.scala — bit-identical to the twin SQL the oracle runs,
    * GeocodeSpec); the hex/conv twin form is kept for the DuckDB side only. */
  def pages(spark: SparkSession, sfDir: String): DataFrame = {
    register(spark, sfDir)
    import org.apache.spark.sql.functions._
    table(spark, sfDir, "documents") // memoized plan, not a fresh footer read
      .withColumn("url", expr(
        "'https://site-' || cast(doc_id % 997 as string) || '.example/p/' || cast(doc_id as string)"))
      .withColumn("__geo", graft.expr.Geocode.geocode(col("text")))
      .select(col("doc_id"), col("url"), col("text"), col("lang"),
        col("source"), col("n_chars"),
        col("__geo").getItem(0).as("lat"), col("__geo").getItem(1).as("lon"))
  }
}
