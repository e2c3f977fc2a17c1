package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global row_number WITHOUT a global sort — the two-phase rank
  * every "order the whole corpus" pass in this engine uses (sorted-
  * neighborhood dedup q96, curriculum ordering q116, sequence packing's
  * prefix sums are the same idea one level up).
  *
  * A naive `row_number().over(Window.orderBy(...))` moves every row into
  * ONE partition — the canonical scale-killer. Instead the caller names
  * a `block` column that is ORDER-ALIGNED with the sort key (every row
  * of a lower block sorts strictly before every row of a higher block —
  * e.g. a leading key prefix, or an integer bucket of the sort value).
  * Phase 1 counts rows per block and turns the tiny per-block totals
  * into broadcast offsets (prefix sum over the block table — block-count
  * rows, not corpus rows); phase 2 ranks rows INSIDE each block in
  * parallel and adds the offset. The result is bit-identical to the
  * naive global window; partition size is bounded by the largest block,
  * which the caller controls by choosing block granularity.
  */
object Ranking {

  /** Append a 1-based exact global rank column `out`, ordering by
    * `order` (which must already embed any tie-break). `block` MUST be
    * order-aligned with `order` (see object docs) — that property is the
    * caller's contract; the arithmetic here is exact either way, but
    * misaligned blocks rank a different total order. A null-valued block
    * forms its own block (the offset join is null-safe) and sorts first,
    * matching a NULLS FIRST ascending order over the block expression. */
  /** `totalOut`: also attach the GRAND total row count as a column of
    * that name. It is the whole-partition sum over the same block table
    * the offsets come from (one extra window spec on an already-single-
    * partition ≤block-count frame, riding the same broadcast) — callers
    * that need N alongside the rank (decile cuts, share-of-corpus)
    * previously paid a THIRD pass over `df` for a plain count. */
  def globalRank(df: DataFrame, block: Column, order: Seq[Column],
      out: String = "rk", totalOut: Option[String] = None): DataFrame = {
    val withBlock = df.withColumn("__rk_block", block)
    val totals = withBlock.groupBy(col("__rk_block").as("__rk_b"))
      .agg(count(lit(1)).as("__rk_n"))
    // prefix sum over the BLOCK TABLE (block-count rows; the single
    // partition here holds one row per block, never corpus rows) — the
    // constant partition key declares that boundedness (see GraftSession)
    val offPrefix = Window.partitionBy(lit(0)).orderBy(col("__rk_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withOff = totals
      .withColumn("__rk_off", sum(col("__rk_n")).over(offPrefix) - col("__rk_n"))
    val offsets = totalOut match {
      case Some(t) => withOff
        .withColumn(t, sum(col("__rk_n")).over(Window.partitionBy(lit(0))))
        .select(col("__rk_b"), col("__rk_off"), col(t))
      case None => withOff.select(col("__rk_b"), col("__rk_off"))
    }
    val inBlock = Window.partitionBy(col("__rk_block")).orderBy(order: _*)
    withBlock
      .join(broadcast(offsets), col("__rk_block") <=> col("__rk_b"))
      .withColumn(out,
        col("__rk_off") + row_number().over(inBlock).cast("long"))
      .drop("__rk_block", "__rk_b", "__rk_off")
  }
}
