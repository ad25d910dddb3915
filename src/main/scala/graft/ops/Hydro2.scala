package graft.ops

import graft.core.{Dialect, DuckD, Geo, Lit, SparkD}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hydro/stream surface expansion over the D8 frame (Hydro.scala):
  *
  *   - FindNoFlowCells (hydro_analysis/find_noflow_cells.rs:183-201):
  *     cells with no strictly-lower present neighbour.
  *   - FillSingleCellPits (fill_pits.rs:185-212): a cell with no lower
  *     neighbour is raised to min(neighbour z) + 0.0001, others pass
  *     through (absent neighbours are skipped — the reference's nodata
  *     sentinel participating in its `min` is a quirk not cloned; an
  *     isolated cell keeps z).
  *   - ExtractStreams (stream_network_analysis/extract_streams.rs
  *     :231-239): flow-accumulation > threshold → 1, else 0 — chained on
  *     the d8_flow_accum fixpoint; the FIRST stream-network row.
  *   - DownslopeFlowpathLength (hydro_analysis/downslope_flowpath_length
  *     .rs:303-345, unit weights): path length from each cell to its flow
  *     terminus. The walk is re-expressed as the Jacobi fixpoint
  *     L(c) = step(c) + L(down(c)) carrying INTEGER (cardinal, diagonal)
  *     step counts, so the final length n_card + n_diag·√2 is one exact
  *     expression in both engines (no order-dependent double chain).
  *   - MaxUpslopeFlowpath (max_upslope_flowpath.rs): the longest upslope
  *     flowpath length terminating at each cell — the same integer-count
  *     fixpoint run against the flow direction, maximizing by the derived
  *     double length (unique per count pair: √2 is irrational).
  *   - Basins (basins.rs): terminal-cell labels via pointer jumping
  *     (O(log path) rounds).
  *   - StrahlerStreamOrder (strahler_order.rs): monotone Jacobi fixpoint;
  *     the oracle unrolls the identical update a fixed 48 rounds (stable
  *     under extra rounds, so parity holds with or without early exit).
  *   - ShreveMagnitude (shreve_magnitude.rs): junction-sum fixpoint; the
  *     oracle counts stream-head paths through each cell (the telescoped
  *     equivalent).
  *   - StreamLinkIdentifier (stream_link_id.rs): chain segments between
  *     junctions labelled by their tail cell via pointer jumping on the
  *     junction-restricted functional forest.
  *
  * Every iteration is one equi-join + hash aggregate with localCheckpoint
  * lineage truncation (the Clump/Distance pattern); rounds = longest flow
  * path. DuckDB twins re-derive the values independently by recursive
  * path enumeration over the same (bit-identical) pointer field.
  */
object Hydro2 {

  private val sqrt2 = Lit.d(math.sqrt(2.0))
  private val streamT = 5L

  private def pagesWith(d: Dialect) = s"WITH pages AS (${Geo.pagesCte(d)})"

  private def densityG(d: Dialect): String =
    s"g AS (SELECT ${Geo.ix(d, "lon", 6)} AS ix, ${Geo.iy(d, "lat", 6)} AS iy, " +
      s"count(*) AS v FROM pages GROUP BY 1, 2)"

  private val duckHalo8 =
    "h AS (SELECT c.ix, c.iy, c.v, n.v AS nv FROM g c JOIN g n " +
      "ON n.ix BETWEEN c.ix - 1 AND c.ix + 1 AND n.iy BETWEEN c.iy - 1 AND c.iy + 1 " +
      "AND NOT (n.ix = c.ix AND n.iy = c.iy))"

  /** step kind per edge: diagonal ⇔ both coords change. */
  private val isDiagE = "CASE WHEN tx <> ix AND ty <> iy THEN 1 ELSE 0 END"

  private def lenOf(nc: String, nd: String) =
    s"cast($nc as double) + cast($nd as double) * $sqrt2"

  private val baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "find_noflow_cells" -> ((s, dir) => {
      Focal.haloD(Raster.density(s, dir, 6))
        .filter(expr("NOT (dx = 0 AND dy = 0)"))
        .groupBy("ix", "iy")
        .agg(expr("cast(sum(CASE WHEN nv < v THEN 1 ELSE 0 END) as bigint)").as("n_lower"))
        .filter(col("n_lower") === 0)
        .select("ix", "iy")
        .orderBy("ix", "iy")
    }),

    "fill_single_cell_pits" -> ((s, dir) => {
      Focal.haloD(Raster.density(s, dir, 6))
        .filter(expr("NOT (dx = 0 AND dy = 0)"))
        .groupBy("ix", "iy")
        .agg(max("v").as("z"), min("nv").as("min_zn"),
          expr("cast(sum(CASE WHEN nv < v THEN 1 ELSE 0 END) as bigint)").as("n_lower"))
        .selectExpr("ix", "iy",
          "CASE WHEN n_lower > 0 THEN cast(z as double) " +
            "WHEN min_zn IS NOT NULL THEN cast(min_zn as double) + 0.0001e0 " +
            "ELSE cast(z as double) END AS z_filled")
        .orderBy("ix", "iy")
    }),

    "extract_streams" -> ((s, dir) => {
      Hydro.queries("d8_flow_accum")(s, dir)
        .selectExpr("ix", "iy",
          s"CASE WHEN fa > $streamT THEN 1 ELSE 0 END AS stream")
        .orderBy("ix", "iy")
    }),

    // L(c) = steps to the terminus, carried as (n_card, n_diag) ints.
    "downslope_flowpath_length" -> ((s, dir) => {
      val dd = Hydro.d8dirsKeep(s, dir).localCheckpoint()
      val edges = dd.filter(col("dir") >= 0)
        .selectExpr("ix", "iy", "tx", "ty", s"1 - ($isDiagE) AS ec", s"$isDiagE AS ed")
        .localCheckpoint()
      val grid = dd.select("ix", "iy")
      var len = grid.selectExpr("ix", "iy", "cast(0 as bigint) AS nc", "cast(0 as bigint) AS nd")
        .localCheckpoint()
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 10000) {
        val stepped = edges.join(
            len.selectExpr("ix AS tx", "iy AS ty", "nc AS dnc", "nd AS dnd"),
            Seq("tx", "ty"))
          .selectExpr("ix", "iy", "ec + dnc AS nc2", "ed + dnd AS nd2")
        val next = grid.join(stepped, Seq("ix", "iy"), "left")
          .selectExpr("ix", "iy", "coalesce(nc2, 0) AS nc", "coalesce(nd2, 0) AS nd")
          .localCheckpoint()
        changed = next.selectExpr("ix", "iy", "nc AS nc2", "nd AS nd2")
          .join(len, Seq("ix", "iy"))
          .filter(expr("nc2 <> nc OR nd2 <> nd")).count()
        len = next
        rounds += 1
      }
      len.selectExpr("ix", "iy", s"${lenOf("nc", "nd")} AS flowpath_len")
        .orderBy("ix", "iy")
    }),

    // Basins (hydro_analysis/basins.rs semantics): every cell labelled by
    // the terminal (no-flow) cell its D8 path drains to — the drainage
    // basin partition. Pointer-JUMPING fixpoint (P ← P∘P), so rounds are
    // O(log longest-path), not O(path length); each round is one
    // self-equi-join + localCheckpoint (the Clump discipline).
    "basins" -> ((s, dir) => {
      val dd = Hydro.d8dirsKeep(s, dir).localCheckpoint()
      var p = dd.selectExpr("ix", "iy",
        "CASE WHEN dir >= 0 THEN tx ELSE ix END AS rx",
        "CASE WHEN dir >= 0 THEN ty ELSE iy END AS ry").localCheckpoint()
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 64) {
        val next = p.join(
            p.selectExpr("ix AS rx", "iy AS ry", "rx AS rx2", "ry AS ry2"),
            Seq("rx", "ry"))
          .selectExpr("ix", "iy", "rx2 AS rx", "ry2 AS ry")
          .localCheckpoint()
        changed = next.selectExpr("ix", "iy", "rx AS nrx", "ry AS nry")
          .join(p, Seq("ix", "iy"))
          .filter(expr("nrx <> rx OR nry <> ry")).count()
        p = next
        rounds += 1
      }
      p.selectExpr("ix", "iy", "rx * 1000000 + ry AS basin")
        .orderBy("ix", "iy")
    }),

    // longest upslope flowpath ending at each cell
    "max_upslope_flowpath" -> ((s, dir) => {
      val dd = Hydro.d8dirsKeep(s, dir).localCheckpoint()
      val edges = dd.filter(col("dir") >= 0)
        .selectExpr("ix", "iy", "tx", "ty", s"1 - ($isDiagE) AS ec", s"$isDiagE AS ed")
        .localCheckpoint()
      val grid = dd.select("ix", "iy")
      var up = grid.selectExpr("ix", "iy", "cast(0 as bigint) AS nc", "cast(0 as bigint) AS nd")
        .localCheckpoint()
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 10000) {
        val cand = edges.join(up, Seq("ix", "iy"))
          .selectExpr("tx AS ix", "ty AS iy", "nc + ec AS cnc", "nd + ed AS cnd")
          .groupBy("ix", "iy")
          .agg(expr(s"max_by(named_struct('nc', cnc, 'nd', cnd), ${lenOf("cnc", "cnd")})").as("b"))
          .selectExpr("ix", "iy", "b.nc AS unc", "b.nd AS und")
        val next = grid.join(cand, Seq("ix", "iy"), "left")
          .selectExpr("ix", "iy", "coalesce(unc, 0) AS nc", "coalesce(und, 0) AS nd")
          .localCheckpoint()
        changed = next.selectExpr("ix", "iy", "nc AS nc2", "nd AS nd2")
          .join(up, Seq("ix", "iy"))
          .filter(expr("nc2 <> nc OR nd2 <> nd")).count()
        up = next
        rounds += 1
      }
      up.selectExpr("ix", "iy", s"${lenOf("nc", "nd")} AS upslope_len")
        .orderBy("ix", "iy")
    })
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries + strahlerQueriesEntry + shreveQueriesEntry + streamLinkEntry

  /** StreamLinkIdentifier (stream_network_analysis/stream_link_id.rs
    * semantics): stream links are the chain segments between junctions —
    * a stream edge u→v stays within a link iff v has exactly ONE stream
    * inflow (a junction starts the next link downstream). The restricted
    * graph is a functional forest, so pointer jumping labels every cell
    * with its chain tail in O(log length) rounds; the tail cell id is the
    * link id (canonical labelling, the Clump discipline — the reference
    * numbers links in scan order, an output-identity choice). */
  private def streamLinkEntry: (String, (SparkSession, String) => DataFrame) =
    "stream_link_id" -> ((s, dir) => {
      val fa = Hydro.queries("d8_flow_accum")(s, dir)
        .filter(col("fa") > streamT).select("ix", "iy").localCheckpoint()
      val dd = Hydro.d8dirsKeep(s, dir)
      val sedges = dd.filter(col("dir") >= 0)
        .join(fa, Seq("ix", "iy"), "left_semi")
        .join(fa.selectExpr("ix AS tx", "iy AS ty"), Seq("tx", "ty"), "left_semi")
        .select("ix", "iy", "tx", "ty").localCheckpoint()
      val inDeg = sedges.groupBy(col("tx").as("ix"), col("ty").as("iy"))
        .agg(count(lit(1)).as("n_in"))
      // same-link parent: downstream target when it is NOT a junction
      val par = fa
        .join(sedges, Seq("ix", "iy"), "left")
        .join(inDeg.selectExpr("ix AS tx", "iy AS ty", "n_in"), Seq("tx", "ty"), "left")
        .selectExpr("ix", "iy",
          "CASE WHEN tx IS NOT NULL AND n_in = 1 THEN tx ELSE ix END AS rx",
          "CASE WHEN tx IS NOT NULL AND n_in = 1 THEN ty ELSE iy END AS ry")
      var p = par.localCheckpoint()
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < 64) {
        val next = p.join(
            p.selectExpr("ix AS rx", "iy AS ry", "rx AS rx2", "ry AS ry2"),
            Seq("rx", "ry"))
          .selectExpr("ix", "iy", "rx2 AS rx", "ry2 AS ry")
          .localCheckpoint()
        changed = next.selectExpr("ix", "iy", "rx AS nrx", "ry AS nry")
          .join(p, Seq("ix", "iy"))
          .filter(expr("nrx <> rx OR nry <> ry")).count()
        p = next
        rounds += 1
      }
      p.selectExpr("ix", "iy", "rx * 1000000 + ry AS link_id")
        .orderBy("ix", "iy")
    })

  /** ShreveMagnitude (stream_network_analysis/shreve_magnitude.rs): heads
    * (stream cells with no stream inflow) carry 1; at a junction the
    * inflowing magnitudes ADD — equivalently, the magnitude of a stream
    * cell is the number of heads whose stream path passes through it,
    * which is exactly what the oracle counts from the path enumeration.
    * Spark side: the same Jacobi fixpoint frame as Strahler with a sum
    * update. */
  private def shreveQueriesEntry: (String, (SparkSession, String) => DataFrame) =
    "shreve_magnitude" -> ((s, dir) => {
      val fa = Hydro.queries("d8_flow_accum")(s, dir)
        .filter(col("fa") > streamT).select("ix", "iy").localCheckpoint()
      val dd = Hydro.d8dirsKeep(s, dir)
      val sedges = dd.filter(col("dir") >= 0)
        .join(fa, Seq("ix", "iy"), "left_semi")
        .join(fa.selectExpr("ix AS tx", "iy AS ty"), Seq("tx", "ty"), "left_semi")
        .select("ix", "iy", "tx", "ty").localCheckpoint()
      var m = fa.selectExpr("ix", "iy", "cast(1 as bigint) AS mag").localCheckpoint()
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < strahlerRounds) {
        val inflow = sedges.join(m, Seq("ix", "iy"))
          .groupBy(col("tx").as("ix"), col("ty").as("iy"))
          .agg(expr("cast(sum(mag) as bigint)").as("msum"))
        val next = fa.join(inflow, Seq("ix", "iy"), "left")
          .selectExpr("ix", "iy", "coalesce(msum, 1) AS mag")
          .localCheckpoint()
        changed = next.selectExpr("ix", "iy", "mag AS m2")
          .join(m, Seq("ix", "iy"))
          .filter(expr("m2 <> mag")).count()
        m = next
        rounds += 1
      }
      m.orderBy("ix", "iy")
    })

  private val strahlerRounds = 48

  /** shared per-round Strahler update: order = 1 at stream heads; at a
    * junction, the max inflowing order, +1 when ≥2 inflows tie at the max
    * (strahler_order.rs semantics). Monotone ⇒ the Jacobi fixpoint
    * converges in ≤ longest-stream-path rounds. */
  private def strahlerQueriesEntry: (String, (SparkSession, String) => DataFrame) =
    "strahler_stream_order" -> ((s, dir) => {
      val fa = Hydro.queries("d8_flow_accum")(s, dir)
        .filter(col("fa") > streamT).select("ix", "iy").localCheckpoint()
      val dd = Hydro.d8dirsKeep(s, dir)
      val sedges = dd.filter(col("dir") >= 0)
        .join(fa, Seq("ix", "iy"), "left_semi")
        .join(fa.selectExpr("ix AS tx", "iy AS ty"), Seq("tx", "ty"), "left_semi")
        .select("ix", "iy", "tx", "ty").localCheckpoint()
      var o = fa.selectExpr("ix", "iy", "cast(1 as bigint) AS ord").localCheckpoint()
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < strahlerRounds) {
        // per junction: the max inflowing order m and the number of
        // inflows at m (count per distinct order, then max_by order)
        val kmax = sedges.join(o, Seq("ix", "iy"))
          .groupBy(col("tx"), col("ty"), col("ord"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("tx").as("ix"), col("ty").as("iy"))
          .agg(expr("max_by(c, ord)").as("kmax"), max("ord").as("m"))
        val next = fa.join(kmax, Seq("ix", "iy"), "left")
          .selectExpr("ix", "iy",
            "CASE WHEN m IS NULL THEN cast(1 as bigint) " +
              "WHEN kmax >= 2 THEN m + 1 ELSE m END AS ord")
          .localCheckpoint()
        changed = next.selectExpr("ix", "iy", "ord AS o2")
          .join(o, Seq("ix", "iy"))
          .filter(expr("o2 <> ord")).count()
        o = next
        rounds += 1
      }
      o.orderBy("ix", "iy")
    })

  // recursive path enumeration with integer step counts, shared by the
  // flowpath twins: paths(sx, sy, cx, cy, nc, nd)
  private def duckPaths: String =
    "e AS (SELECT ix, iy, tx, ty, " +
      s"1 - ($isDiagE) AS ec, $isDiagE AS ed FROM dd WHERE dir >= 0), " +
      "paths AS (SELECT ix AS sx, iy AS sy, ix AS cx, iy AS cy, " +
      "cast(0 as bigint) AS nc, cast(0 as bigint) AS nd FROM dd " +
      "UNION ALL SELECT p.sx, p.sy, e.tx, e.ty, p.nc + e.ec, p.nd + e.ed " +
      "FROM paths p JOIN e ON e.ix = p.cx AND e.iy = p.cy)"

  def oracles: Map[String, String] = Map(
    "find_noflow_cells" ->
      (s"${pagesWith(DuckD)}, ${densityG(DuckD)}, $duckHalo8 " +
        "SELECT ix, iy FROM h GROUP BY ix, iy " +
        "HAVING cast(sum(CASE WHEN nv < v THEN 1 ELSE 0 END) as bigint) = 0 " +
        "ORDER BY ix, iy"),
    "fill_single_cell_pits" ->
      (s"${pagesWith(DuckD)}, ${densityG(DuckD)}, $duckHalo8, " +
        "ag AS (SELECT ix, iy, max(v) AS z, min(nv) AS min_zn, " +
        "cast(sum(CASE WHEN nv < v THEN 1 ELSE 0 END) as bigint) AS n_lower " +
        "FROM h GROUP BY ix, iy) " +
        "SELECT ix, iy, CASE WHEN n_lower > 0 THEN cast(z as double) " +
        "WHEN min_zn IS NOT NULL THEN cast(min_zn as double) + 0.0001e0 " +
        "ELSE cast(z as double) END AS z_filled FROM ag ORDER BY ix, iy"),
    "extract_streams" ->
      (s"WITH RECURSIVE ${Hydro.duckDirsCtes}, " +
        "e0 AS (SELECT ix, iy, tx, ty FROM dd WHERE dir >= 0), " +
        "paths0 AS (SELECT ix AS sx, iy AS sy, ix AS cx, iy AS cy FROM dd " +
        "UNION ALL SELECT p.sx, p.sy, e0.tx, e0.ty FROM paths0 p " +
        "JOIN e0 ON e0.ix = p.cx AND e0.iy = p.cy), " +
        "fa AS (SELECT cx AS ix, cy AS iy, count(*) AS fa FROM paths0 GROUP BY 1, 2) " +
        s"SELECT ix, iy, CASE WHEN fa > $streamT THEN 1 ELSE 0 END AS stream " +
        "FROM fa ORDER BY ix, iy"),
    "basins" ->
      (s"WITH RECURSIVE ${Hydro.duckDirsCtes}, " +
        "e0 AS (SELECT ix, iy, tx, ty FROM dd WHERE dir >= 0), " +
        "paths0 AS (SELECT ix AS sx, iy AS sy, ix AS cx, iy AS cy FROM dd " +
        "UNION ALL SELECT p.sx, p.sy, e0.tx, e0.ty FROM paths0 p " +
        "JOIN e0 ON e0.ix = p.cx AND e0.iy = p.cy) " +
        "SELECT p.sx AS ix, p.sy AS iy, p.cx * 1000000 + p.cy AS basin " +
        "FROM paths0 p JOIN dd ON dd.ix = p.cx AND dd.iy = p.cy AND dd.dir < 0 " +
        "ORDER BY ix, iy"),
    "downslope_flowpath_length" ->
      (s"WITH RECURSIVE ${Hydro.duckDirsCtes}, " +
        s"$duckPaths, " +
        // terminal row per start = the max-step path row (paths are chains,
        // so the row with max nc+nd per start is the terminus)
        "t AS (SELECT sx AS ix, sy AS iy, max(nc) AS nc, max(nd) AS nd FROM paths GROUP BY 1, 2) " +
        s"SELECT ix, iy, ${lenOf("nc", "nd")} AS flowpath_len FROM t ORDER BY ix, iy"),
    "max_upslope_flowpath" ->
      (s"WITH RECURSIVE ${Hydro.duckDirsCtes}, " +
        s"$duckPaths, " +
        "m AS (SELECT cx AS ix, cy AS iy, nc, nd, " +
        s"row_number() OVER (PARTITION BY cx, cy ORDER BY ${lenOf("nc", "nd")} DESC) AS rn " +
        "FROM paths) " +
        s"SELECT ix, iy, ${lenOf("nc", "nd")} AS upslope_len FROM m WHERE rn = 1 ORDER BY ix, iy"),
    "strahler_stream_order" -> strahlerDuck,
    "shreve_magnitude" -> shreveDuck,
    "stream_link_id" -> streamLinkDuck
  )

  /** walk the same-link parent chain (functional) to its terminal. */
  private def streamLinkDuck: String =
    s"WITH RECURSIVE ${Hydro.duckDirsCtes}, " +
      "e0 AS (SELECT ix, iy, tx, ty FROM dd WHERE dir >= 0), " +
      "paths0 AS (SELECT ix AS sx, iy AS sy, ix AS cx, iy AS cy FROM dd " +
      "UNION ALL SELECT p.sx, p.sy, e0.tx, e0.ty FROM paths0 p " +
      "JOIN e0 ON e0.ix = p.cx AND e0.iy = p.cy), " +
      "fa0 AS (SELECT cx AS ix, cy AS iy, count(*) AS fa FROM paths0 GROUP BY 1, 2), " +
      s"st AS MATERIALIZED (SELECT ix, iy FROM fa0 WHERE fa > $streamT), " +
      "se AS MATERIALIZED (SELECT e0.ix, e0.iy, e0.tx, e0.ty FROM e0 " +
      "JOIN st a ON a.ix = e0.ix AND a.iy = e0.iy " +
      "JOIN st b ON b.ix = e0.tx AND b.iy = e0.ty), " +
      "indeg AS (SELECT tx AS ix, ty AS iy, count(*) AS n_in FROM se GROUP BY 1, 2), " +
      "lp AS MATERIALIZED (SELECT st.ix, st.iy, " +
      "CASE WHEN se.tx IS NOT NULL AND ind.n_in = 1 THEN se.tx ELSE st.ix END AS rx, " +
      "CASE WHEN se.tx IS NOT NULL AND ind.n_in = 1 THEN se.ty ELSE st.iy END AS ry " +
      "FROM st LEFT JOIN se ON se.ix = st.ix AND se.iy = st.iy " +
      "LEFT JOIN indeg ind ON ind.ix = se.tx AND ind.iy = se.ty), " +
      "walk AS (SELECT ix AS sx, iy AS sy, ix AS cx, iy AS cy FROM lp " +
      "UNION ALL SELECT w.sx, w.sy, l.rx, l.ry FROM walk w " +
      "JOIN lp l ON l.ix = w.cx AND l.iy = w.cy AND NOT (l.rx = w.cx AND l.ry = w.cy)) " +
      "SELECT w.sx AS ix, w.sy AS iy, w.cx * 1000000 + w.cy AS link_id " +
      "FROM walk w JOIN lp t ON t.ix = w.cx AND t.iy = w.cy AND t.rx = w.cx AND t.ry = w.cy " +
      "ORDER BY ix, iy"

  /** magnitude(c) = number of stream heads whose stream path visits c —
    * the telescoped form of the junction-sum definition. */
  private def shreveDuck: String =
    s"WITH RECURSIVE ${Hydro.duckDirsCtes}, " +
      "e0 AS (SELECT ix, iy, tx, ty FROM dd WHERE dir >= 0), " +
      "paths0 AS (SELECT ix AS sx, iy AS sy, ix AS cx, iy AS cy FROM dd " +
      "UNION ALL SELECT p.sx, p.sy, e0.tx, e0.ty FROM paths0 p " +
      "JOIN e0 ON e0.ix = p.cx AND e0.iy = p.cy), " +
      "fa0 AS (SELECT cx AS ix, cy AS iy, count(*) AS fa FROM paths0 GROUP BY 1, 2), " +
      s"st AS MATERIALIZED (SELECT ix, iy FROM fa0 WHERE fa > $streamT), " +
      "se AS MATERIALIZED (SELECT e0.ix, e0.iy, e0.tx, e0.ty FROM e0 " +
      "JOIN st a ON a.ix = e0.ix AND a.iy = e0.iy " +
      "JOIN st b ON b.ix = e0.tx AND b.iy = e0.ty), " +
      "heads AS (SELECT ix, iy FROM st WHERE NOT EXISTS " +
      "(SELECT 1 FROM se WHERE se.tx = st.ix AND se.ty = st.iy)), " +
      "walk AS (SELECT ix AS hx, iy AS hy, ix AS cx, iy AS cy FROM heads " +
      "UNION ALL SELECT w.hx, w.hy, se.tx, se.ty FROM walk w " +
      "JOIN se ON se.ix = w.cx AND se.iy = w.cy) " +
      "SELECT cx AS ix, cy AS iy, count(*) AS mag FROM walk GROUP BY 1, 2 ORDER BY ix, iy"

  /** unrolled Jacobi rounds of the Strahler update (the fixpoint is stable
    * under extra rounds, so running the FULL strahlerRounds here equals
    * the Spark side's early-exited loop state). */
  private def strahlerDuck: String = {
    val rounds = (1 to strahlerRounds).map { r =>
      val p = s"o${r - 1}"
      s"g$r AS (SELECT se.tx, se.ty, o.ord, count(*) AS c FROM se " +
        s"JOIN $p o ON o.ix = se.ix AND o.iy = se.iy GROUP BY 1, 2, 3), " +
        s"k$r AS (SELECT tx, ty, arg_max(c, ord) AS kmax, max(ord) AS m FROM g$r GROUP BY 1, 2), " +
        s"o$r AS MATERIALIZED (SELECT st.ix, st.iy, CASE WHEN k.m IS NULL THEN cast(1 as bigint) " +
        s"WHEN k.kmax >= 2 THEN k.m + 1 ELSE k.m END AS ord " +
        s"FROM st LEFT JOIN k$r k ON k.tx = st.ix AND k.ty = st.iy)"
    }.mkString(", ")
    s"WITH RECURSIVE ${Hydro.duckDirsCtes}, " +
      "e0 AS (SELECT ix, iy, tx, ty FROM dd WHERE dir >= 0), " +
      "paths0 AS (SELECT ix AS sx, iy AS sy, ix AS cx, iy AS cy FROM dd " +
      "UNION ALL SELECT p.sx, p.sy, e0.tx, e0.ty FROM paths0 p " +
      "JOIN e0 ON e0.ix = p.cx AND e0.iy = p.cy), " +
      "fa0 AS (SELECT cx AS ix, cy AS iy, count(*) AS fa FROM paths0 GROUP BY 1, 2), " +
      s"st AS MATERIALIZED (SELECT ix, iy FROM fa0 WHERE fa > $streamT), " +
      "se AS MATERIALIZED (SELECT e0.ix, e0.iy, e0.tx, e0.ty FROM e0 " +
      "JOIN st a ON a.ix = e0.ix AND a.iy = e0.iy " +
      "JOIN st b ON b.ix = e0.tx AND b.iy = e0.ty), " +
      "o0 AS (SELECT ix, iy, cast(1 as bigint) AS ord FROM st), " +
      s"$rounds " +
      s"SELECT ix, iy, ord FROM o$strahlerRounds ORDER BY ix, iy"
  }
}
