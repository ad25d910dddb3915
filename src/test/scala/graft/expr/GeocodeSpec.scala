package graft.expr

import graft.SparkSpec
import graft.core.{Geo, SparkD}
import org.apache.spark.sql.functions._

/** GeocodeExpr must be bit-identical to the twin SQL the DuckDB oracle
  * runs — asserted across every document at sf0.01 (both branches of the
  * urban-skew CASE exercised). */
class GeocodeSpec extends SparkSpec {

  test("GeocodeExpr == twin SQL on all documents (exact doubles)") {
    import spark.implicits._
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val both = docs
      .withColumn("g", Geocode.geocode(col("text")))
      .withColumn("lat2", expr(Geo.lat(SparkD)))
      .withColumn("lon2", expr(Geo.lon(SparkD)))
      .select($"doc_id", $"g".getItem(0).as("lat1"), $"g".getItem(1).as("lon1"),
        $"lat2", $"lon2")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(both.length === 500)
    both.foreach { case (id, lat1, lon1, lat2, lon2) =>
      assert(java.lang.Double.doubleToLongBits(lat1) ===
        java.lang.Double.doubleToLongBits(lat2), s"lat mismatch doc $id")
      assert(java.lang.Double.doubleToLongBits(lon1) ===
        java.lang.Double.doubleToLongBits(lon2), s"lon mismatch doc $id")
    }
    // both geocode branches exercised
    val urban = both.count(r => r._2 > 35.0 && r._2 < 52.0)
    assert(urban > 0)
  }
}
