package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tile-row raster encoding — SURVEY §1.2 mapping (b), the declared
  * 100 TB mirror of the reference's chunked dask arrays
  * (plugins/__init__.py:34-35: a Scene's rasters are xarray DataArrays
  * backed by dask CHUNKS, and every reference raster operator executes
  * chunk-at-a-time).
  *
  * Encoding: one row per (area, product, tile_y, tile_x) carrying a
  * dense row-major `ArrayType(DoubleType)` of [[TileSize]]² cells, null
  * = fill (the reference's NaN, doc/source/plugins.rst:320). Against the
  * tall one-row-per-pixel encoding (mapping (a), [[Trollflow]]), the
  * tile encoding changes the SCALE story, not the semantics:
  *
  *  - a 100 TB raster is ~10¹³ pixels — tall rows mean per-pixel shuffle
  *    keys for every operator; tiles cut row count (and shuffle-key
  *    volume) by TileSize² (1024× here, ~10⁶× at a production 1024²
  *    chunk size);
  *  - operators whose support fits inside a tile (block aggregate with
  *    block | tile) become PER-ROW array kernels — zero exchange beyond
  *    the layout build, embarrassingly tile-parallel exactly like the
  *    reference's dask block map (`coarsen` runs per chunk);
  *  - operators that cross tile edges (resample) explode WITHIN the
  *    tile row and rely on partial aggregation: the hash aggregate
  *    combines per-target candidates map-side BEFORE the exchange, so
  *    the shuffle carries target-grain rows, never pixel-grain ones.
  *
  * The two operators the VERDICT asked for are re-expressed here over
  * tiles — q164 twins q39's T1 `aggregate` (plugins/__init__.py:124-130)
  * and q165 twins q55's T2 nearest `resample`
  * (plugins/__init__.py:149-192) — at per-(area, product) grain (the
  * reference aggregates each product's raster independently), with
  * DuckDB oracles over the TALL derivation proving tall ≡ tiled on the
  * fixture grid, and TiledRasterSpec pinning the Spark-side tall twin
  * equal bit-for-bit.
  *
  * In-array lambdas (`transform`/`aggregate`) run interpreted, not
  * codegen — the trade is deliberate and profiled the right way around:
  * they REMOVE the per-pixel exchange entirely (the one case the
  * array-at-a-time form wins; compare Dedup q121's docstring where the
  * same rewrite LOST because the window's shuffle stayed either way).
  */
object TiledRaster {
  type Q = (SparkSession, String) => DataFrame

  /** Tile edge in pixels. 32 on the 256×256 fixture grid (64 tiles per
    * product raster — enough parallelism at test scale); a production
    * 100 TB deployment picks the dask-typical 512–1024 (the math below
    * only assumes the q39/q55 block and crop sizes divide it). */
  val TileSize = 32

  /** Blocks per tile edge for the q39-semantics block aggregate: 8-pixel
    * blocks over 32-pixel tiles → 4×4 = 16 blocks, never straddling a
    * tile edge. */
  private val B = 8
  private val BlocksPerSide = TileSize / B

  /** Tile assembly — the write-once LAYOUT step (the analogue of
    * [[PostingsStore.materialize]] for rasters: at 100 TB this table is
    * written once and every raster operator reads it; in the fixture
    * queries it is built in-line from the tall parquet derivation).
    * Two shuffles, both at assembly time only: pixel-grain cell means
    * (the reference's one-value-per-pixel Scene contract), then
    * tile-grain array packing. `try_element_at` fills absent pixels
    * with null — the NaN-fill convention.
    *
    * [[tiles]] serves the session-shared memoized frame (the
    * [[SharedFrames]] warm-layout contract every stored family uses:
    * consumers are timed against the layout, not its build); this is
    * the raw assembly plan the layout-shape spec pins. */
  private[graft] def tilesPlan(spark: SparkSession, dir: String): DataFrame =
    tilesOf(Trollflow.raster(spark, dir))

  /** Tile assembly over ANY tall pixel frame (area, product, y, x,
    * value) — the fixture derivation above and the streaming scene
    * ingest ([[graft.streaming.StreamRunner.tileIngest]]) share this
    * one definition, so batch-built and stream-built tiles agree by
    * construction. */
  private[graft] def tilesOf(tall: DataFrame): DataFrame = {
    val n = TileSize
    tall
      .groupBy(col("area"), col("product"), col("y"), col("x"))
      .agg(avg(col("value")).as("cell"))
      .withColumn("tile_y", expr(s"y div $n"))
      .withColumn("tile_x", expr(s"x div $n"))
      .withColumn("idx", expr(s"CAST((y % $n) * $n + (x % $n) AS INT)"))
      .groupBy(col("area"), col("product"), col("tile_y"), col("tile_x"))
      .agg(map_from_entries(collect_list(struct(col("idx"), col("cell"))))
        .as("m"))
      .select(col("area"), col("product"), col("tile_y"), col("tile_x"),
        expr(s"transform(sequence(0, ${n * n - 1}), i -> try_element_at(m, i))")
          .as("cells"))
  }

  /** The tile table every tiled operator reads: the on-disk store when
    * [[TileStore]] is in disk mode (the 100 TB path — tiles scan off
    * parquet, they don't fit in memory), else the session-shared
    * persisted frame (one per (session, dir) — mirroring how a
    * deployment reads the stored layout instead of re-assembling per
    * query). Consumers are mode-unaware. */
  def tiles(spark: SparkSession, dir: String): DataFrame =
    TileStore.lookup(spark, dir).getOrElse(
      SharedFrames.cached(spark, dir, "tiles")(tilesPlan(spark, dir)))

  /** Materialize the shared tile frame untimed (Bench/QTime warm-up). */
  private[graft] def warmTilesShared(spark: SparkSession, dir: String): Unit = {
    tiles(spark, dir).count()
    ()
  }

  /** T1 `aggregate` over TILES (q39's block-mean semantics at
    * per-product grain): 8×8 block means computed INSIDE each tile's
    * array — blocks divide tiles, so after the layout build the
    * operator is a per-row kernel with ZERO exchange (the tall form
    * shuffles every pixel; pinned by TiledRasterSpec). The in-array
    * fold accumulates (sum, count) over each block's 64 positions,
    * skipping nulls — count(*) semantics of the tall twin's cells rows. */
  def q164TiledBlockAggregate(spark: SparkSession, dir: String): DataFrame = {
    val n = TileSize
    val blocks =
      s"""transform(sequence(0, ${BlocksPerSide * BlocksPerSide - 1}), b ->
         |  aggregate(
         |    sequence(0, ${B * B - 1}),
         |    named_struct('s', 0D, 'c', 0L),
         |    (a, j) -> if(
         |      cells[CAST((b div $BlocksPerSide) * ${B * n} + (j div $B) * $n
         |            + (b % $BlocksPerSide) * $B + (j % $B) AS INT)] IS NULL,
         |      a,
         |      named_struct(
         |        's', a.s + cells[CAST((b div $BlocksPerSide) * ${B * n}
         |              + (j div $B) * $n + (b % $BlocksPerSide) * $B
         |              + (j % $B) AS INT)],
         |        'c', a.c + 1L)),
         |    a -> named_struct('b', b, 's', a.s, 'c', a.c)))""".stripMargin
    tiles(spark, dir)
      .select(col("area"), col("product"), col("tile_y"), col("tile_x"),
        explode(expr(blocks)).as("blk"))
      .filter(col("blk.c") > 0)
      .select(col("area"), col("product"),
        (col("tile_y") * BlocksPerSide + expr(s"blk.b div $BlocksPerSide")).as("by"),
        (col("tile_x") * BlocksPerSide + expr(s"blk.b % $BlocksPerSide")).as("bx"),
        round(lit(1e-9) + col("blk.s") / col("blk.c"), 4).as("block_mean"),
        col("blk.c").as("n_cells"))
      .orderBy(col("area"), col("product"), col("by"), col("bx"))
  }

  val q164Sql: String =
    s"""WITH ${Trollflow.rasterSql},
       |cells AS (
       |  SELECT area, product, y, x, avg(value) AS cell
       |  FROM raster GROUP BY 1, 2, 3, 4)
       |SELECT area, product, y // 8 AS by, x // 8 AS bx,
       |  round(1e-9 + avg(cell), 4) AS block_mean, count(*) AS n_cells
       |FROM cells
       |GROUP BY 1, 2, 3, 4
       |ORDER BY area, product, by, bx""".stripMargin

  /** T2 nearest `resample` over TILES (q55's semantics at per-product
    * grain). The `reduce_data` crop (y,x < 128) prunes at TILE grain —
    * 128 = 4·TileSize, so `tile_y < 4 AND tile_x < 4` is the exact crop
    * and the filter eliminates whole tile ROWS before any work. Cells
    * then posexplode WITHIN the tile row (narrow — no exchange) into
    * their covering target cells, and `min(struct(d², y, x, cell))`
    * partial-aggregates map-side: each partition combines its pixels
    * down to one candidate per target cell BEFORE the exchange, so the
    * shuffle carries O(target cells) rows per partition — never pixel
    * rows (pinned by TiledRasterSpec). Ties break on (y, x), matching
    * q55's window order, via the struct's lexicographic min. */
  def q165TiledResampleNearest(spark: SparkSession, dir: String): DataFrame = {
    val n = TileSize
    tiles(spark, dir)
      .filter(col("tile_y") < 128 / n && col("tile_x") < 128 / n)
      .select(col("area"), col("product"),
        col("tile_y").as("tyt"), col("tile_x").as("txt"),
        posexplode(col("cells")).as(Seq("idx", "cell")))
      .filter(col("cell").isNotNull)
      .withColumn("y", col("tyt") * n + expr(s"idx div $n"))
      .withColumn("x", col("txt") * n + expr(s"idx % $n"))
      .withColumn("ty", expr("(y * 100) div 256"))
      .withColumn("tx", expr("(x * 100) div 256"))
      .withColumn("d2",
        expr("(y * 100 + 50 - (ty * 256 + 128)) * (y * 100 + 50 - (ty * 256 + 128))" +
          " + (x * 100 + 50 - (tx * 256 + 128)) * (x * 100 + 50 - (tx * 256 + 128))"))
      .groupBy(col("area"), col("product"), col("ty"), col("tx"))
      .agg(min(struct(col("d2"), col("y"), col("x"), col("cell"))).as("best"))
      .select(col("area"), col("product"), col("ty"), col("tx"),
        round(lit(1e-9) + col("best.cell"), 4).as("nearest"))
      .orderBy(col("area"), col("product"), col("ty"), col("tx"))
  }

  val q165Sql: String =
    s"""WITH ${Trollflow.rasterSql},
       |cells AS (
       |  SELECT area, product, y, x, avg(value) AS cell
       |  FROM raster WHERE y < 128 AND x < 128
       |  GROUP BY 1, 2, 3, 4),
       |m AS (
       |  SELECT area, product, y, x, cell,
       |    (y * 100) // 256 AS ty, (x * 100) // 256 AS tx
       |  FROM cells),
       |d AS (
       |  SELECT area, product, ty, tx, cell, y, x,
       |    (y * 100 + 50 - (ty * 256 + 128)) AS dy,
       |    (x * 100 + 50 - (tx * 256 + 128)) AS dx
       |  FROM m),
       |r AS (
       |  SELECT area, product, ty, tx, cell,
       |    row_number() OVER (PARTITION BY area, product, ty, tx
       |                       ORDER BY dy * dy + dx * dx, y, x) AS rn
       |  FROM d)
       |SELECT area, product, ty, tx, round(1e-9 + cell, 4) AS nearest
       |FROM r WHERE rn = 1
       |ORDER BY area, product, ty, tx""".stripMargin

  /** F6/A1 valid-data fraction over TILES — the reference's literal
    * `valid.sum() / valid.size` contract (plugins/__init__.py:1062-1064:
    * notnull count over the ALLOCATED array size, NaN = fill): per
    * (area, product), non-null cells over tiles × TileSize². The null
    * slots of the dense tile arrays ARE the fill pixels, so the
    * denominator falls out of the encoding — where the tall form (q41)
    * can only see rows that exist. Per-row array kernel (`filter` +
    * `size`) then one (area, product)-grain aggregation: zero exchange
    * at pixel grain past the layout build, same scale shape as q164. */
  def q166TiledValidFraction(spark: SparkSession, dir: String): DataFrame = {
    val n = TileSize
    tiles(spark, dir)
      .select(col("area"), col("product"),
        size(filter(col("cells"), c => c.isNotNull)).as("n_valid"))
      .groupBy(col("area"), col("product"))
      .agg(
        round(lit(1e-9) + sum(col("n_valid")) /
          (count(lit(1)) * lit(n * n)), 5).as("valid_frac"),
        sum(col("n_valid")).as("n_cells"),
        count(lit(1)).as("n_tiles"))
      .orderBy(col("area"), col("product"))
  }

  val q166Sql: String =
    s"""WITH ${Trollflow.rasterSql},
       |cells AS (
       |  SELECT DISTINCT area, product, y, x FROM raster),
       |per_tile AS (
       |  SELECT area, product, y // $TileSize AS ty, x // $TileSize AS tx,
       |    count(*) AS n_valid
       |  FROM cells GROUP BY 1, 2, 3, 4)
       |SELECT area, product,
       |  round(1e-9 + sum(n_valid)::DOUBLE /
       |    (count(*) * ${TileSize * TileSize}), 5) AS valid_frac,
       |  sum(n_valid)::BIGINT AS n_cells, count(*) AS n_tiles
       |FROM per_tile
       |GROUP BY 1, 2
       |ORDER BY area, product""".stripMargin

  /** T2 bilinear `resample` over TILES with HALO exchange — the dask
    * `map_overlap` pattern (the reference's chunked arrays do exactly
    * this for any kernel with spatial support: ghost cells travel to
    * the neighbor chunk once, then the kernel is chunk-local).
    *
    * q63's semantics at per-(area, product) grain: each target cell
    * center maps to a continuous source coordinate; its value is the
    * weight-renormalized mask-aware blend of the ≤ 4 surrounding source
    * cells. The 4-corner neighborhood can straddle tile edges, so each
    * tile SENDS its top row, left column, and top-left pixel to the
    * neighbor tiles that need them (≤ 3 bounded halo records per tile,
    * 65 doubles total), and each target is computed exactly once in the
    * tile that owns its (y0, x0) corner.
    *
    * Scale shape vs the tall q63: the tall form pays FOUR shuffle
    * equi-joins of targets × corners; this pays ONE tile-grain shuffle
    * (the halo assembly — payload O(tiles × TileSize), not O(pixels))
    * and the blend itself is a per-row array kernel. No joins at all
    * (pinned in TiledRasterSpec). The blend is the identical fixed-order
    * expression as q63/the oracle, so doubles agree bit-for-bit before
    * rounding.
    *
    * Measured both ways (warm layout, sf0.1, best-of-2): the in-array
    * HOF kernel below runs 1.07 s vs tall q63's 1.25 s; a
    * codegen-friendly rewrite (explode the (ty, tx) pairs, blend as
    * post-explode columns) measured 1.71 s — every exploded target row
    * drags the tile's 8 KiB `cells` array (plus halo fragments) through
    * the Generate's row copy, and that allocation churn costs more than
    * the interpreted lambda math it saves. Same trade-shape as q121's
    * docstring, opposite winner: keep the kernel INSIDE the array, emit
    * only the small result structs.
    *
    * Geometry caveat, and why `off` is a parameter: at the REGISTERED
    * offset 14, the map y0 = (128t+14) div 100 happens to skip every
    * residue ≡ 31 (mod 32) on t ∈ [0,99] — no corner ever crosses a
    * 32-tile edge, so the halo fragments ship but are never read on
    * this exact grid. That is a property of these constants, not of the
    * operator: TiledRasterSpec re-runs the SAME code at off = 50 (where
    * y0 = 31/x0 = 31 occur and all four halo reads — r, b, r[ly+1],
    * br — fire) and pins tiled ≡ tall there too, so a broken halo
    * payload or index diverges loudly instead of hiding behind a
    * geometry that never exercises it. */
  def q167TiledResampleBilinear(spark: SparkSession, dir: String): DataFrame =
    tiledBilinear(spark, dir, off = 14)

  /** [[q167TiledResampleBilinear]] with the target-mapping offset
    * explicit — source index y0 = (128·t + off) div 100, fraction
    * fy = ((128·t + off) % 100) / 100. */
  private[graft] def tiledBilinear(spark: SparkSession, dir: String,
      off: Int): DataFrame = {
    val n = TileSize
    val t = tiles(spark, dir)
      .filter(col("tile_y") < 128 / n && col("tile_x") < 128 / n)
    val keys = Seq(col("area"), col("product"))
    // halo: every tile contributes itself to its own group, its LEFT
    // column to the tile on its left, its TOP row to the tile above, and
    // its top-left pixel to the diagonal neighbor — the three fragments
    // a bilinear corner can reach across an edge
    val contrib = t
      .select(keys :+ col("tile_y") :+ col("tile_x") :+
        lit("c").as("kind") :+ col("cells").as("payload"): _*)
      .unionByName(t.filter(col("tile_x") > 0)
        .select(keys :+ col("tile_y") :+ (col("tile_x") - 1).as("tile_x") :+
          lit("r").as("kind") :+
          expr(s"transform(sequence(0, ${n - 1}), i -> cells[i * $n])")
            .as("payload"): _*))
      .unionByName(t.filter(col("tile_y") > 0)
        .select(keys :+ (col("tile_y") - 1).as("tile_y") :+ col("tile_x") :+
          lit("b").as("kind") :+ expr(s"slice(cells, 1, $n)").as("payload"): _*))
      .unionByName(t.filter(col("tile_y") > 0 && col("tile_x") > 0)
        .select(keys :+ (col("tile_y") - 1).as("tile_y") :+
          (col("tile_x") - 1).as("tile_x") :+ lit("br").as("kind") :+
          expr("array(cells[0])").as("payload"): _*))
    // ONE tile-grain shuffle assembles tile + halo; a group may exist on
    // halo alone (data-less tile whose neighbors have edge pixels — its
    // targets still blend from the corners that DO exist, mask-aware)
    val assembled = contrib
      .groupBy(col("area"), col("product"), col("tile_y"), col("tile_x"))
      .agg(
        max(when(col("kind") === "c", col("payload"))).as("c"),
        max(when(col("kind") === "r", col("payload"))).as("r"),
        max(when(col("kind") === "b", col("payload"))).as("b"),
        max(when(col("kind") === "br", col("payload"))).as("br"))
    // tile-local kernel: every target (ty, tx) whose (y0, x0) corner
    // lives in this tile; corners read from the tile array or the halo
    // fragments; the blend is q63's fixed-order expression verbatim.
    // SQL lambdas can't be immediately applied, so let-bindings use the
    // single-element-transform idiom: element_at(transform(array(e),
    // e -> body), 1) binds e for the body — once for the local
    // coordinates/fractions, once for the four corner values.
    val kernel =
      s"""flatten(transform(
         |  filter(sequence(0, 99),
         |    t -> (128 * t + $off) div 100 >= tile_y * $n
         |     and (128 * t + $off) div 100 < (tile_y + 1) * $n),
         |  t -> transform(
         |    filter(sequence(0, 99),
         |      u -> (128 * u + $off) div 100 >= tile_x * $n
         |       and (128 * u + $off) div 100 < (tile_x + 1) * $n),
         |    u -> element_at(transform(array(named_struct(
         |        'ly', (128 * t + $off) div 100 - tile_y * $n,
         |        'lx', (128 * u + $off) div 100 - tile_x * $n,
         |        'fy', ((128 * t + $off) % 100) / 100.0,
         |        'fx', ((128 * u + $off) % 100) / 100.0)),
         |      e -> element_at(transform(array(named_struct(
         |          'v00', c[CAST(e.ly * $n + e.lx AS INT)],
         |          'v01', if(e.lx < ${n - 1},
         |                    c[CAST(e.ly * $n + e.lx + 1 AS INT)],
         |                    r[CAST(e.ly AS INT)]),
         |          'v10', if(e.ly < ${n - 1},
         |                    c[CAST((e.ly + 1) * $n + e.lx AS INT)],
         |                    b[CAST(e.lx AS INT)]),
         |          'v11', if(e.ly < ${n - 1} and e.lx < ${n - 1},
         |                      c[CAST((e.ly + 1) * $n + e.lx + 1 AS INT)],
         |                    if(e.ly < ${n - 1}, r[CAST(e.ly + 1 AS INT)],
         |                    if(e.lx < ${n - 1}, b[CAST(e.lx + 1 AS INT)],
         |                       br[0]))))),
         |        v -> named_struct(
         |          'ty', t, 'tx', u,
         |          'num', (1.0 - e.fy) * (1.0 - e.fx) * coalesce(v.v00, 0D)
         |            + (1.0 - e.fy) * e.fx * coalesce(v.v01, 0D)
         |            + e.fy * (1.0 - e.fx) * coalesce(v.v10, 0D)
         |            + e.fy * e.fx * coalesce(v.v11, 0D),
         |          'den', (1.0 - e.fy) * (1.0 - e.fx) * if(v.v00 is null, 0D, 1D)
         |            + (1.0 - e.fy) * e.fx * if(v.v01 is null, 0D, 1D)
         |            + e.fy * (1.0 - e.fx) * if(v.v10 is null, 0D, 1D)
         |            + e.fy * e.fx * if(v.v11 is null, 0D, 1D),
         |          'n_nb', if(v.v00 is null, 0, 1) + if(v.v01 is null, 0, 1)
         |            + if(v.v10 is null, 0, 1) + if(v.v11 is null, 0, 1))
         |      ), 1)
         |    ), 1))))""".stripMargin
    assembled
      .select(col("area"), col("product"),
        explode(expr(s"filter($kernel, s -> s.den > 0)")).as("s"))
      .select(col("area"), col("product"),
        col("s.ty").as("ty"), col("s.tx").as("tx"),
        round(lit(1e-9) + col("s.num") / col("s.den"), 4).as("bilinear"),
        col("s.n_nb").as("n_nb"))
      .orderBy(col("area"), col("product"), col("ty"), col("tx"))
  }

  val q167Sql: String =
    s"""WITH ${Trollflow.rasterSql},
       |cells AS (
       |  SELECT area, product, y, x, avg(value) AS cell
       |  FROM raster WHERE y < 128 AND x < 128
       |  GROUP BY 1, 2, 3, 4),
       |targets AS (
       |  SELECT area, product, ty, tx,
       |    (128 * ty + 14) // 100 AS y0, (128 * tx + 14) // 100 AS x0,
       |    ((128 * ty + 14) % 100) / 100.0 AS fy,
       |    ((128 * tx + 14) % 100) / 100.0 AS fx
       |  FROM (SELECT DISTINCT area, product FROM cells),
       |       range(0, 100) t1(ty), range(0, 100) t2(tx)),
       |j AS (
       |  SELECT t.*,
       |    c00.cell AS v00, c01.cell AS v01, c10.cell AS v10, c11.cell AS v11
       |  FROM targets t
       |  LEFT JOIN cells c00 ON t.area = c00.area AND t.product = c00.product
       |    AND t.y0 = c00.y AND t.x0 = c00.x
       |  LEFT JOIN cells c01 ON t.area = c01.area AND t.product = c01.product
       |    AND t.y0 = c01.y AND t.x0 + 1 = c01.x
       |  LEFT JOIN cells c10 ON t.area = c10.area AND t.product = c10.product
       |    AND t.y0 + 1 = c10.y AND t.x0 = c10.x
       |  LEFT JOIN cells c11 ON t.area = c11.area AND t.product = c11.product
       |    AND t.y0 + 1 = c11.y AND t.x0 + 1 = c11.x),
       |b AS (
       |  SELECT area, product, ty, tx,
       |    (1.0 - fy) * (1.0 - fx) * coalesce(v00, 0.0)
       |      + (1.0 - fy) * fx * coalesce(v01, 0.0)
       |      + fy * (1.0 - fx) * coalesce(v10, 0.0)
       |      + fy * fx * coalesce(v11, 0.0) AS num,
       |    (1.0 - fy) * (1.0 - fx) * (CASE WHEN v00 IS NULL THEN 0.0 ELSE 1.0 END)
       |      + (1.0 - fy) * fx * (CASE WHEN v01 IS NULL THEN 0.0 ELSE 1.0 END)
       |      + fy * (1.0 - fx) * (CASE WHEN v10 IS NULL THEN 0.0 ELSE 1.0 END)
       |      + fy * fx * (CASE WHEN v11 IS NULL THEN 0.0 ELSE 1.0 END) AS den,
       |    (CASE WHEN v00 IS NULL THEN 0 ELSE 1 END)
       |      + (CASE WHEN v01 IS NULL THEN 0 ELSE 1 END)
       |      + (CASE WHEN v10 IS NULL THEN 0 ELSE 1 END)
       |      + (CASE WHEN v11 IS NULL THEN 0 ELSE 1 END) AS n_nb
       |  FROM j)
       |SELECT area, product, ty, tx,
       |  round(1e-9 + num / den, 4) AS bilinear, n_nb
       |FROM b WHERE den > 0
       |ORDER BY area, product, ty, tx""".stripMargin

  /** T2 ewa `resample` over TILES (q123's scatter-splat semantics at
    * per-(area, product) grain): each source cell splats a
    * gaussian-weighted contribution onto every target cell within
    * r = 1.0 of its mapped position; targets blend sum(w·v)/sum(w).
    *
    * SCATTER is the tile-friendly direction (the reference's own EWA
    * works this way over dask chunks): cells posexplode WITHIN the tile
    * row, fan out by the plan-time constant 9 (3×3 candidate window),
    * and the single target-grain hash aggregate partial-combines
    * map-side — the same exchange shape as q165, with sums instead of a
    * min. No halo needed: scatter means a contribution is computed
    * where the SOURCE lives and merged at the target key, so cross-tile
    * support costs nothing extra (compare q167, where the GATHER form
    * needs ghost cells). Together the three tiled resamplers cover the
    * three scale patterns: in-tile kernel (q164), scatter + partial agg
    * (q165/q168), gather + halo (q167). */
  def q168TiledResampleEwa(spark: SparkSession, dir: String): DataFrame = {
    val lnInv = 4.605170185988092 // ln(1/0.01), shared literal (q123's)
    val n = TileSize
    tiles(spark, dir)
      .filter(col("tile_y") < 128 / n && col("tile_x") < 128 / n)
      .select(col("area"), col("product"),
        col("tile_y").as("tyt"), col("tile_x").as("txt"),
        posexplode(col("cells")).as(Seq("idx", "cell")))
      .filter(col("cell").isNotNull)
      .withColumn("y", col("tyt") * n + expr(s"idx div $n"))
      .withColumn("x", col("txt") * n + expr(s"idx % $n"))
      .withColumn("ny", col("y") * 200 + 100) // ((2y+1)·100)
      .withColumn("nx", col("x") * 200 + 100)
      .withColumn("tyb", expr(s"(ny - 128 + ${256L * (1L << 20)}) div 256 - ${1L << 20}"))
      .withColumn("txb", expr(s"(nx - 128 + ${256L * (1L << 20)}) div 256 - ${1L << 20}"))
      .withColumn("ky", explode(sequence(lit(-1), lit(1))))
      .withColumn("kx", explode(sequence(lit(-1), lit(1))))
      .withColumn("ty", col("tyb") + col("ky"))
      .withColumn("tx", col("txb") + col("kx"))
      .withColumn("dy", col("ny") / 256.0 - (col("ty") + lit(0.5)))
      .withColumn("dx", col("nx") / 256.0 - (col("tx") + lit(0.5)))
      .withColumn("d2", col("dy") * col("dy") + col("dx") * col("dx"))
      .filter(col("d2") <= 1.0 &&
        col("ty") >= 0 && col("ty") < 100 && col("tx") >= 0 && col("tx") < 100)
      .withColumn("w", exp(col("d2") * lit(-lnInv)))
      .groupBy(col("area"), col("product"), col("ty"), col("tx"))
      .agg(round(lit(1e-9) + sum(col("w") * col("cell")) / sum(col("w")), 4)
        .as("ewa"),
        count(lit(1)).as("n_contrib"))
      .orderBy(col("area"), col("product"), col("ty"), col("tx"))
  }

  val q168Sql: String =
    s"""WITH ${Trollflow.rasterSql},
       |cells AS (
       |  SELECT area, product, y, x, avg(value) AS cell
       |  FROM raster WHERE y < 128 AND x < 128
       |  GROUP BY 1, 2, 3, 4),
       |pos AS (
       |  SELECT area, product, cell, y * 200 + 100 AS ny, x * 200 + 100 AS nx,
       |    (y * 200 + 100 - 128 + ${256L * (1L << 20)}) // 256 - ${1L << 20} AS tyb,
       |    (x * 200 + 100 - 128 + ${256L * (1L << 20)}) // 256 - ${1L << 20} AS txb
       |  FROM cells),
       |splat AS (
       |  SELECT area, product, cell, ny, nx, tyb + ky AS ty, txb + kx AS tx,
       |    (ny / 256.0 - (tyb + ky + 0.5)) AS dy,
       |    (nx / 256.0 - (txb + kx + 0.5)) AS dx
       |  FROM pos, range(-1, 2) g1(ky), range(-1, 2) g2(kx)),
       |wtd AS (
       |  SELECT area, product, ty, tx, cell,
       |    exp((dy * dy + dx * dx) * -4.605170185988092) AS w
       |  FROM splat
       |  WHERE dy * dy + dx * dx <= 1.0
       |    AND ty >= 0 AND ty < 100 AND tx >= 0 AND tx < 100)
       |SELECT area, product, ty, tx,
       |  round(1e-9 + sum(w * cell) / sum(w), 4) AS ewa,
       |  count(*) AS n_contrib
       |FROM wtd
       |GROUP BY 1, 2, 3, 4
       |ORDER BY area, product, ty, tx""".stripMargin

  /** Tall twins at the SAME per-product grain — the spec's tall ≡ tiled
    * equivalence pins the Spark implementations against each other
    * (the DuckDB oracle independently re-derives the same results from
    * the tall CTE). Pixel-grain shuffles throughout: the encoding the
    * tile table exists to replace at scale. */
  private[graft] def tallBlockAggregate(spark: SparkSession, dir: String): DataFrame =
    Trollflow.raster(spark, dir)
      .groupBy(col("area"), col("product"), col("y"), col("x"))
      .agg(avg(col("value")).as("cell"))
      .groupBy(col("area"), col("product"),
        expr("y div 8").as("by"), expr("x div 8").as("bx"))
      .agg(round(lit(1e-9) + avg(col("cell")), 4).as("block_mean"),
        count(lit(1)).as("n_cells"))
      .orderBy(col("area"), col("product"), col("by"), col("bx"))

  private[graft] def tallResampleBilinear(spark: SparkSession, dir: String,
      off: Int = 14): DataFrame = {
    val cells = Trollflow.raster(spark, dir)
      .filter(col("y") < 128 && col("x") < 128)
      .groupBy(col("area"), col("product"), col("y"), col("x"))
      .agg(avg(col("value")).as("cell"))
      .persist()
    val targets = cells.select(col("area"), col("product")).distinct()
      .crossJoin(spark.range(100).toDF("ty"))
      .crossJoin(spark.range(100).toDF("tx"))
      .withColumn("y0", expr(s"(128 * ty + $off) div 100"))
      .withColumn("x0", expr(s"(128 * tx + $off) div 100"))
      .withColumn("fy", expr(s"((128 * ty + $off) % 100) / 100.0"))
      .withColumn("fx", expr(s"((128 * tx + $off) % 100) / 100.0"))
    val joined = Seq(("00", 0, 0), ("01", 0, 1), ("10", 1, 0), ("11", 1, 1))
      .foldLeft(targets) { case (df, (tag, dy, dx)) =>
        df.join(
          cells.select(col("area").as(s"a_$tag"), col("product").as(s"p_$tag"),
            col("y").as(s"y_$tag"), col("x").as(s"x_$tag"),
            col("cell").as(s"v_$tag")),
          col("area") === col(s"a_$tag") && col("product") === col(s"p_$tag") &&
            col("y0") + dy === col(s"y_$tag") &&
            col("x0") + dx === col(s"x_$tag"),
          "left")
      }
    def w(tag: String): org.apache.spark.sql.Column = tag match {
      case "00" => (lit(1.0) - col("fy")) * (lit(1.0) - col("fx"))
      case "01" => (lit(1.0) - col("fy")) * col("fx")
      case "10" => col("fy") * (lit(1.0) - col("fx"))
      case "11" => col("fy") * col("fx")
    }
    def present(tag: String): org.apache.spark.sql.Column =
      when(col(s"v_$tag").isNull, lit(0.0)).otherwise(lit(1.0))
    val num = Seq("00", "01", "10", "11")
      .map(t => w(t) * coalesce(col(s"v_$t"), lit(0.0))).reduce(_ + _)
    val den = Seq("00", "01", "10", "11")
      .map(t => w(t) * present(t)).reduce(_ + _)
    val nNb = Seq("00", "01", "10", "11")
      .map(t => present(t)).reduce(_ + _).cast("int")
    joined
      .withColumn("den", den)
      .filter(col("den") > 0)
      .select(col("area"), col("product"), col("ty"), col("tx"),
        round(lit(1e-9) + num / col("den"), 4).as("bilinear"),
        nNb.as("n_nb"))
      .orderBy(col("area"), col("product"), col("ty"), col("tx"))
  }

  private[graft] def tallResampleEwa(spark: SparkSession, dir: String): DataFrame = {
    val lnInv = 4.605170185988092
    Trollflow.raster(spark, dir)
      .filter(col("y") < 128 && col("x") < 128)
      .groupBy(col("area"), col("product"), col("y"), col("x"))
      .agg(avg(col("value")).as("cell"))
      .withColumn("ny", col("y") * 200 + 100)
      .withColumn("nx", col("x") * 200 + 100)
      .withColumn("tyb", expr(s"(ny - 128 + ${256L * (1L << 20)}) div 256 - ${1L << 20}"))
      .withColumn("txb", expr(s"(nx - 128 + ${256L * (1L << 20)}) div 256 - ${1L << 20}"))
      .withColumn("ky", explode(sequence(lit(-1), lit(1))))
      .withColumn("kx", explode(sequence(lit(-1), lit(1))))
      .withColumn("ty", col("tyb") + col("ky"))
      .withColumn("tx", col("txb") + col("kx"))
      .withColumn("dy", col("ny") / 256.0 - (col("ty") + lit(0.5)))
      .withColumn("dx", col("nx") / 256.0 - (col("tx") + lit(0.5)))
      .withColumn("d2", col("dy") * col("dy") + col("dx") * col("dx"))
      .filter(col("d2") <= 1.0 &&
        col("ty") >= 0 && col("ty") < 100 && col("tx") >= 0 && col("tx") < 100)
      .withColumn("w", exp(col("d2") * lit(-lnInv)))
      .groupBy(col("area"), col("product"), col("ty"), col("tx"))
      .agg(round(lit(1e-9) + sum(col("w") * col("cell")) / sum(col("w")), 4)
        .as("ewa"),
        count(lit(1)).as("n_contrib"))
      .orderBy(col("area"), col("product"), col("ty"), col("tx"))
  }

  private[graft] def tallResampleNearest(spark: SparkSession, dir: String): DataFrame = {
    val cells = Trollflow.raster(spark, dir)
      .filter(col("y") < 128 && col("x") < 128)
      .groupBy(col("area"), col("product"), col("y"), col("x"))
      .agg(avg(col("value")).as("cell"))
      .withColumn("ty", expr("(y * 100) div 256"))
      .withColumn("tx", expr("(x * 100) div 256"))
      .withColumn("dy", col("y") * 100 + 50 - (col("ty") * 256 + 128))
      .withColumn("dx", col("x") * 100 + 50 - (col("tx") * 256 + 128))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("area"), col("product"), col("ty"), col("tx"))
      .orderBy((col("dy") * col("dy") + col("dx") * col("dx")).asc,
        col("y"), col("x"))
    cells.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("area"), col("product"), col("ty"), col("tx"),
        round(lit(1e-9) + col("cell"), 4).as("nearest"))
      .orderBy(col("area"), col("product"), col("ty"), col("tx"))
  }

  val defs: Map[String, Q] = Map(
    "q164_tiled_block_aggregate" -> (q164TiledBlockAggregate _),
    "q165_tiled_resample_nearest" -> (q165TiledResampleNearest _),
    "q166_tiled_valid_fraction" -> (q166TiledValidFraction _),
    "q167_tiled_resample_bilinear" -> (q167TiledResampleBilinear _),
    "q168_tiled_resample_ewa" -> (q168TiledResampleEwa _)
  )

  val oracles: Map[String, String] = Map(
    "q164_tiled_block_aggregate" -> q164Sql,
    "q165_tiled_resample_nearest" -> q165Sql,
    "q166_tiled_valid_fraction" -> q166Sql,
    "q167_tiled_resample_bilinear" -> q167Sql,
    "q168_tiled_resample_ewa" -> q168Sql
  )
}
