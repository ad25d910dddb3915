package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Reference-faithful approximate kNN: expanding-square shell scan over FRS
  * buckets (fixed_radius_search.rs:134-218).
  *
  * Semantics cloned from the reference:
  *   - bucket width w = r/2, key = (floor(x/w), floor(y/w))   [:66,104-108]
  *   - start with the 3×3 block (shells 0..1)                 [:150-166]
  *   - while fewer than k candidates seen, scan the next full square shell
  *     (Chebyshev ring: |m|==shell or |n|==shell)              [:180-204]
  *   - result = k smallest squared distances among ALL scanned buckets
  *     (a closer point can hide in an unscanned shell — the reference
  *     accepts this approximation, :132-133)
  *   - tie-break: the reference keeps earlier-inserted candidates on equal
  *     d² (NMinimizer insert uses strict <, n_minimizer.rs:41-58); bucket
  *     scan order is not reproducible in a parallel join, so we impose
  *     (d², id) — deterministic, and identical to the reference whenever
  *     d² values are distinct.
  *
  * Plan: driver-controlled loop, one batched cell-equi join per round over
  * the *still-unsatisfied* queries (the frontier shrinks every round, so
  * late rounds touch a vanishing fraction of data). Candidates accumulate
  * per query in a persisted DataFrame; each round keeps only the k best per
  * query via the bounded TopKByDist aggregator (≡ NMinimizer, O(k) state,
  * map-side partials) so accumulator size stays ≤ k·|queries| regardless
  * of density. No broadcast of the point side; skewed buckets are split
  * by AQE.
  */
object KnnShell {

  /** @param queries (qid, qx, qy)
    * @param points  (id, x, y)
    * @param k       neighbours wanted
    * @param r       FRS radius parameter (bucket width = r/2)
    * @param maxShell safety bound on expansion (world edge) */
  def knn(spark: SparkSession, queries: DataFrame, points: DataFrame,
          k: Int, r: Double, maxShell: Int = 64): DataFrame = {
    import spark.implicits._
    val w = r * 0.5
    val pts = points.select(col("id"), col("x"), col("y"),
      floor(col("x") / w).cast("long").as("bx"),
      floor(col("y") / w).cast("long").as("by"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    def ringOffsets(shellLo: Int, shellHi: Int): Seq[(Int, Int)] =
      for {
        m <- -shellHi to shellHi; n <- -shellHi to shellHi
        s = math.max(math.abs(m), math.abs(n))
        if s >= shellLo && s <= shellHi
      } yield (m, n)

    def candidates(active: DataFrame, shellLo: Int, shellHi: Int): DataFrame = {
      val offDf = ringOffsets(shellLo, shellHi).toDF("m", "n")
      active
        .withColumn("qbx", floor(col("qx") / w).cast("long"))
        .withColumn("qby", floor(col("qy") / w).cast("long"))
        .crossJoin(broadcast(offDf))
        .withColumn("bx", col("qbx") + col("m"))
        .withColumn("by", col("qby") + col("n"))
        .join(pts, Seq("bx", "by"))
        .select(col("qid"), col("qx"), col("qy"), col("id"),
          ((col("x") - col("qx")) * (col("x") - col("qx")) +
           (col("y") - col("qy")) * (col("y") - col("qy"))).as("d2"))
    }

    // Per-round prune: the bounded TopKByDist aggregator (≡ NMinimizer,
    // O(k) state, map-side partials) — not a per-qid sort window; the
    // shuffle carries ≤ k rows per query each round.
    def prune(df: DataFrame): DataFrame =
      df.groupBy("qid")
        .agg(max("qx").as("qx"), max("qy").as("qy"),
          graft.agg.TopKByDist.topK(k)(col("d2"), col("id")).as("tk"))
        .select(col("qid"), col("qx"), col("qy"), explode(col("tk")).as("e"))
        .select(col("qid"), col("qx"), col("qy"),
          col("e.id").as("id"), col("e.dist").as("d2"))

    val active = queries.select(col("qid"), col("qx"), col("qy"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Round 0: the 3×3 start block (shells 0..1). Eager localCheckpoint
    // truncates lineage every round — without it the logical plan doubles
    // per iteration (SURVEY §2.5: Dataset loop + checkpoint every k iters).
    var acc = prune(candidates(active, 0, 1))
      .localCheckpoint()
    var shell = 2
    var done = false
    while (!done && shell <= maxShell) {
      val counts = acc.groupBy("qid").agg(count(lit(1)).as("found"))
      val unsatisfied = active.join(
        counts.filter(col("found") >= k).select("qid"), Seq("qid"), "left_anti")
        .localCheckpoint()
      if (unsatisfied.isEmpty) done = true
      else {
        // one complete shell per round — the reference checks the stop
        // condition after each full shell (:180-204), so wider batches
        // would admit candidates the reference never scans
        val fresh = candidates(unsatisfied, shell, shell)
        acc = prune(
            acc.join(unsatisfied.select("qid"), Seq("qid"), "left_semi")
              .select("qid", "qx", "qy", "id", "d2")
              .unionByName(fresh))
          .unionByName(acc.join(unsatisfied.select("qid"), Seq("qid"), "left_anti")
            .select("qid", "qx", "qy", "id", "d2"))
          .localCheckpoint()
        shell += 1
      }
    }
    pts.unpersist(); active.unpersist()
    acc.groupBy("qid")
      .agg(graft.agg.TopKByDist.topK(k)(col("d2"), col("id")).as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), expr("cast(pos + 1 as int)").as("rank"),
        col("col.id").as("id"), col("col.dist").as("d2"))
  }
}
