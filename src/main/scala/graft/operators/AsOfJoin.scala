package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join: for each left row, attach the chosen columns of the
  * latest right row with `right.ts <= left.ts` and equal key.
  *
  * Implemented with the union + ordered-window technique rather than a
  * range cross-join: both sides are tagged, unioned, and a single
  * `last(_, ignoreNulls)` window per key carries the most recent right-side
  * values forward onto left rows. Cost is one shuffle on the key plus a
  * per-key sort — linear in input, no pair explosion, and skew is handled
  * by AQE. This is the plan shape a 100 TB as-of join needs (point-in-time
  * feature joins etc.).
  *
  * Equal timestamps: right rows sort before left rows, so `<=` (inclusive)
  * semantics; ties among right rows are broken by `rightTieBreak` for
  * determinism.
  */
object AsOfJoin {
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightCols: Map[String, String],
      rightTieBreak: String
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val side = "_graft_side"
    val tie = "_graft_tie"

    val l2 = rightCols.values.foldLeft(
      left.withColumn(side, lit(1)).withColumn(tie, lit(null).cast("long"))
    ) { case (df, out) => df.withColumn(out, lit(null)) }

    val rBase = right.select(
      Seq(col(key), col(ts), lit(0).as(side), col(rightTieBreak).cast("long").as(tie)) ++
        rightCols.map { case (in, out) => col(in).as(out) }: _*)
    // null-pad the left-only columns so the union schemas line up
    val r2 = leftCols.filterNot(c => c == key || c == ts).foldLeft(rBase) {
      case (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val unioned = l2.unionByName(r2.select(l2.columns.map(col).toSeq: _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(side), col(tie))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightCols.values.foldLeft(unioned) { case (df, out) =>
      df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    filled.filter(col(side) === 1).drop(side, tie)
  }
}
