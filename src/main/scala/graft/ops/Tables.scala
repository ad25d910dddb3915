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

  /** pages(doc_id, url, text, lang, lat, lon) — geocoded page corpus. */
  def pages(spark: SparkSession, sfDir: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(Geo.pagesCte(SparkD))
  }
}
