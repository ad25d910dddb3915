package graft.ops

import graft.core.{Dialect, DuckD, Geo}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EuclideanDistance / EuclideanAllocation (gis_analysis/
  * euclidean_distance.rs:31, euclidean_allocation.rs) — distance from every
  * grid cell to its nearest SOURCE cell, plus the source's identity/value.
  *
  * The reference runs the Shih & Wu (2004) two-pass sequential transform —
  * inherently serial over the whole grid. The Spark-native equivalent is
  * the KnnShell pattern: Chebyshev ring batches grow outward from each
  * remaining cell ([0..2], [3..6], [7..14], …); after scanning radius K, a
  * cell whose best squared distance < (K+1)² is PROVABLY final (any
  * unscanned source is at Chebyshev ≥ K+1 ⇒ d² ≥ (K+1)²), so it leaves the
  * loop. Each batch is one broadcast offset-explode + equi-join + min
  * aggregate; lineage is truncated per round (localCheckpoint), like the
  * Clump loop. Results are EXACT (integer cell arithmetic) and the
  * tie-break is deterministic: min (d², source id) via one packed int key.
  *
  * Scale: work per batch is |remaining| × ring area, and remaining shrinks
  * geometrically in dense-source grids — the distributed analogue of the
  * reference's linear scan, with no global sweep.
  */
object Distance {

  /** packed candidate key: d²·2³² + sid, sid = sx·10⁶ + sy (injective for
    * res ≤ ~19). min(key) = lexicographic min of (d², sid). */
  private val keyExpr = "(dx * dx + dy * dy) * 4294967296 + (sx * 1000000 + sy)"

  /** @param maxK optional override of the ring bound; 0 (default) sizes it
    *             from the grid extent — the Chebyshev distance from any
    *             cell to any source is at most the grid span, so the loop
    *             provably drains `remaining` (no silently dropped cells).
    *             If no cell matches srcCond, every cell is emitted with
    *             NULL distance/source (reference EuclideanDistance nodata
    *             semantics for a source-free raster). */
  def euclidean(spark: SparkSession, grid: DataFrame, srcCond: String,
                maxK: Int = 0): DataFrame = {
    import spark.implicits._
    val nullOut = grid.selectExpr("ix", "iy", "cast(null as bigint) AS d2",
      "cast(null as bigint) AS src_ix", "cast(null as bigint) AS src_iy")
    val srcs = grid.filter(expr(srcCond))
      .selectExpr("ix AS sx", "iy AS sy")
    if (srcs.isEmpty) return nullOut
    val ringMax =
      if (maxK > 0) maxK
      else {
        val Array((mnx, mxx, mny, mxy)) = grid
          .agg(expr("min(ix)"), expr("max(ix)"), expr("min(iy)"), expr("max(iy)"))
          .as[(Long, Long, Long, Long)].collect()
        math.max(1L, math.max(mxx - mnx, mxy - mny)).toInt
      }
    var remaining = grid.select("ix", "iy").localCheckpoint()
    var pending: DataFrame = null // (ix, iy, key) found but not yet provably final
    var finals: DataFrame = null
    var prevK = -1
    var k = 2
    while (prevK < ringMax && !remaining.isEmpty) {
      import spark.implicits._
      val offs = (for {
        dx <- -k to k; dy <- -k to k
        if math.max(dx.abs, dy.abs) > prevK
      } yield (dx, dy)).toDF("dx", "dy")
      val cand = remaining.crossJoin(broadcast(offs))
        .withColumn("sx", col("ix") + col("dx"))
        .withColumn("sy", col("iy") + col("dy"))
        .join(srcs, Seq("sx", "sy"))
        .selectExpr("ix", "iy", s"$keyExpr AS key")
      val batchBest = cand.groupBy("ix", "iy").agg(min("key").as("key"))
      val best = (if (pending == null) batchBest
                  else pending.unionByName(batchBest))
        .groupBy("ix", "iy").agg(min("key").as("key"))
        .localCheckpoint()
      val bound = (k + 1).toLong * (k + 1).toLong * 4294967296L
      val fin = best.filter(col("key") < bound)
      finals = if (finals == null) fin else finals.unionByName(fin)
      pending = best.filter(col("key") >= bound)
      remaining = remaining.join(fin.select("ix", "iy"), Seq("ix", "iy"), "left_anti")
        .localCheckpoint()
      prevK = k
      k = math.min(k * 2 + 2, ringMax)
    }
    // After the final round k == ringMax every source has been scanned for
    // every still-pending cell, so pending keys are true minima.
    if (finals == null) return nullOut // empty grid
    val all = if (pending == null || pending.isEmpty) finals
              else finals.unionByName(pending)
    all.selectExpr("ix", "iy",
      "cast(key div 4294967296 as bigint) AS d2",
      "cast((key % 4294967296) div 1000000 as bigint) AS src_ix",
      "cast((key % 4294967296) % 1000000 as bigint) AS src_iy")
  }

  private val srcCond = "v >= 8"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "euclidean_distance" -> ((s, dir) =>
      euclidean(s, Raster.density(s, dir, 6), srcCond)
        .select("ix", "iy", "d2").orderBy("ix", "iy")),
    "euclidean_allocation" -> ((s, dir) => {
      val g = Raster.density(s, dir, 6)
      euclidean(s, g, srcCond)
        .join(g.selectExpr("ix AS src_ix", "iy AS src_iy", "v AS src_v"),
          Seq("src_ix", "src_iy"))
        .select("ix", "iy", "src_ix", "src_iy", "src_v")
        .orderBy("ix", "iy")
    })
  )

  // ---- DuckDB twins: brute-force min over all (cell, source) pairs ------

  private def base(d: Dialect): String =
    s"WITH pages AS (${Geo.pagesCte(d)}), " +
      s"g AS (SELECT ${Geo.ix(d, "lon", 6)} AS ix, ${Geo.iy(d, "lat", 6)} AS iy, " +
      "count(*) AS v FROM pages GROUP BY 1, 2), " +
      s"srcs AS (SELECT ix AS sx, iy AS sy, v AS sv FROM g WHERE $srcCond), " +
      "b AS (SELECT c.ix, c.iy, " +
      "min(((c.ix - sx) * (c.ix - sx) + (c.iy - sy) * (c.iy - sy)) * 4294967296 + (sx * 1000000 + sy)) AS key " +
      "FROM g c, srcs GROUP BY 1, 2)"

  def oracles: Map[String, String] = Map(
    "euclidean_distance" ->
      (s"${base(DuckD)} SELECT ix, iy, cast(key // 4294967296 as bigint) AS d2 " +
        "FROM b ORDER BY ix, iy"),
    "euclidean_allocation" ->
      (s"${base(DuckD)} SELECT ix, iy, " +
        "cast((key % 4294967296) // 1000000 as bigint) AS src_ix, " +
        "cast((key % 4294967296) % 1000000 as bigint) AS src_iy, sv AS src_v " +
        "FROM b JOIN srcs ON sx = cast((key % 4294967296) // 1000000 as bigint) " +
        "AND sy = cast((key % 4294967296) % 1000000 as bigint) ORDER BY ix, iy")
  )
}
