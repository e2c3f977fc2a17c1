package graft

import org.apache.spark.sql.DataFrame

import graft.queries.TiledRaster

/** The tile-row raster encoding (SURVEY §1.2 mapping (b)): tall ≡ tiled
  * on the fixture grid, and the plan shapes that make tiles the 100 TB
  * path — the block aggregate adds ZERO exchanges beyond the layout
  * build, and the resample's exchange carries target-grain rows via
  * map-side partial min, never pixel rows. */
class TiledRasterSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("tiled block aggregate == tall block aggregate, bit for bit") {
    val tiled = rows(TiledRaster.q164TiledBlockAggregate(spark, sf))
    val tall = rows(TiledRaster.tallBlockAggregate(spark, sf))
    assert(tiled.nonEmpty, "empty result would vacuously pass")
    assert(tiled == tall, "tile encoding diverged from the tall encoding")
  }

  test("tiled nearest resample == tall nearest resample, bit for bit") {
    val tiled = rows(TiledRaster.q165TiledResampleNearest(spark, sf))
    val tall = rows(TiledRaster.tallResampleNearest(spark, sf))
    assert(tiled.nonEmpty, "empty result would vacuously pass")
    assert(tiled == tall, "tile encoding diverged from the tall encoding")
  }

  test("tile table: dense row-major arrays, null fill, full coverage") {
    import org.apache.spark.sql.functions._
    val t = TiledRaster.tiles(spark, sf).cache()
    try {
      val n = TiledRaster.TileSize
      // every tile is a dense TileSize^2 array
      assert(t.filter(size(col("cells")) =!= n * n).count() == 0)
      // spot-check placement: cell (y, x) of the tall derivation appears
      // at cells[(y % n) * n + (x % n)] of tile (y div n, x div n)
      val cellsTall = queries.Trollflow.raster(spark, sf)
        .groupBy(col("area"), col("product"), col("y"), col("x"))
        .agg(avg(col("value")).as("cell"))
      val sample = cellsTall.orderBy(col("area"), col("product"), col("y"),
        col("x")).limit(5).collect()
      sample.foreach { r =>
        val (area, product) = (r.getString(0), r.getString(1))
        val (y, x) = (r.getLong(2), r.getLong(3))
        val tile = t.filter(col("area") === area && col("product") === product
            && col("tile_y") === y / n && col("tile_x") === x / n)
          .select(col("cells")).head().getSeq[Any](0)
        val got = tile(((y % n) * n + (x % n)).toInt)
        assert(got == r.getDouble(4), s"cell ($y, $x) misplaced in its tile")
      }
    } finally { t.unpersist(); () }
  }

  test("q164 plan: block means are tile-local — only the two layout-build exchanges") {
    val p = SparkEntry.queries("q164_tiled_block_aggregate")(spark, sf)
      .queryExecution.executedPlan.toString
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // pixel-grain cell means + tile packing = the layout build's two
    // shuffles; the block-mean kernel itself runs per tile ROW and adds
    // zero (the tall form pays a third, pixel-keyed exchange for the
    // block grouping). The final orderBy is a rangepartitioning exchange
    // over block-grain rows, not a hash one.
    assert(hashEx == 2, s"block aggregate grew a post-layout shuffle:\n$p")
    assert(!p.contains("Window"), "block aggregate should not need a window")
  }

  test("q165 plan: resample shuffles target-grain rows — partial min before the exchange") {
    val df = SparkEntry.queries("q165_tiled_resample_nearest")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // layout build (2) + the one target-cell aggregation exchange
    assert(hashEx == 3, s"resample grew extra shuffles:\n$p")
    // map-side combine: a partial_min HashAggregate must sit BELOW the
    // target exchange, so pixels collapse to <= one candidate per target
    // cell per partition before anything crosses the network
    assert(p.contains("partial_min"),
      s"no map-side partial aggregation before the target exchange:\n$p")
    // the tall twin resolves nearest with a per-target window sort over
    // pixel rows; the tiled form must not
    assert(!p.contains("Window"), "tiled resample reintroduced the window")
  }

  test("q165 plan: reduce_data crop prunes whole tile rows before the explode") {
    val p = SparkEntry.queries("q165_tiled_resample_nearest")(spark, sf)
      .queryExecution.executedPlan.toString
    // the crop predicate is on the tile KEYS (tile_y/tile_x < 4), visible
    // as a filter on the tile aggregation's output, not on exploded pixels
    assert(p.contains("tile_y") && p.contains("tile_x"),
      s"tile-grain crop keys missing from the plan:\n$p")
  }
}
