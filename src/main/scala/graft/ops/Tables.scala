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

  def register(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      spark.read.parquet(s"$sfDir/$n.parquet").createOrReplaceTempView(n)
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** pages(doc_id, url, text, lang, source, n_chars, lat, lon) — geocoded
    * page corpus. The Spark plan uses the single-digest GeocodeExpr
    * (expr/Geocode.scala — bit-identical to the twin SQL the oracle runs,
    * GeocodeSpec); the hex/conv twin form is kept for the DuckDB side only. */
  def pages(spark: SparkSession, sfDir: String): DataFrame = {
    register(spark, sfDir)
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("url", expr(
        "'https://site-' || cast(doc_id % 997 as string) || '.example/p/' || cast(doc_id as string)"))
      .withColumn("__geo", graft.expr.Geocode.geocode(col("text")))
      .select(col("doc_id"), col("url"), col("text"), col("lang"),
        col("source"), col("n_chars"),
        col("__geo").getItem(0).as("lat"), col("__geo").getItem(1).as("lon"))
  }
}
