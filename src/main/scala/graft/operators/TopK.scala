package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k-per-key aggregation.
  *
  * The declarative form — `row_number().over(Window.partitionBy(key)
  * .orderBy(score.desc)) <= k` — shuffles EVERY row to the key's
  * partition and sorts the whole partition, i.e. O(N log N) work and
  * O(N) shuffle bytes for an output of size keys·k. This aggregator
  * keeps a size-k ordered buffer per key instead: map-side partial
  * aggregation reduces each input partition to ≤ k rows per key before
  * the exchange, so the shuffle carries at most partitions·keys·k rows
  * and nothing is ever fully sorted. At 100 TB the window form is a
  * terabyte-scale sort; this is a streaming bounded-memory pass.
  *
  * Ordering is (score desc, id asc) — ties break to the smaller id,
  * matching the `orderBy(desc, id)` window convention, with exact
  * double comparison, so results are bit-equal to the window form.
  */
object TopK {
  type Entry = (Double, Long)

  final case class TopKAgg(k: Int)
      extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    require(k > 0, "topk: k must be positive")

    private def better(a: Entry, b: Entry): Boolean = {
      // java.lang.Double.compare gives the NaN-total order Spark's sort
      // uses (NaN greatest), so NaN scores rank identically to the
      // row_number().over(orderBy(desc)) window form instead of falling
      // through raw `>` (where NaN is never better than anything)
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }

    private def insert(b: Seq[Entry], a: Entry): Seq[Entry] =
      if (b.length >= k && !better(a, b.last)) b
      else {
        val i = b.indexWhere(better(a, _)) match {
          case -1 => b.length
          case p  => p
        }
        ((b.take(i) :+ a) ++ b.drop(i)).take(k)
      }

    override def zero: Seq[Entry] = Vector.empty
    override def reduce(b: Seq[Entry], a: Entry): Seq[Entry] = insert(b, a)
    override def merge(b1: Seq[Entry], b2: Seq[Entry]): Seq[Entry] =
      b2.foldLeft(b1)(insert)
    override def finish(r: Seq[Entry]): Seq[Entry] = r
    override def bufferEncoder: Encoder[Seq[Entry]] =
      ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      ExpressionEncoder[Seq[Entry]]()
  }

  /** `topk(k)(score, id)` aggregate column: array of the key's top-k
    * (score, id) structs, ordered (score desc, id asc). */
  def topk(k: Int)(score: Column, id: Column): Column =
    udaf(TopKAgg(k)).apply(score, id)
}
