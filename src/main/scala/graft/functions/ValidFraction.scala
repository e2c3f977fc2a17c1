package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed valid-data-fraction aggregator (SURVEY §7.3's custom-Aggregator
  * slot; reference semantics: "valid data is any data that is not fill
  * value (NaN)", doc/source/plugins.rst:320, counted at
  * plugins/__init__.py:1062-1064).
  *
  * Buffer is a pair of longs (valid, total) — fixed-size, exact, and
  * merge-associative, so Spark computes it with map-side partial
  * aggregation and no double-summation drift; the fraction materializes
  * only in `finish`. Null and NaN both count as fill. Usable typed
  * (`ds.select(ValidFraction.toColumn)`) or untyped via
  * `functions.udaf(ValidFraction)`.
  */
object ValidFraction extends Aggregator[java.lang.Double, (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: java.lang.Double): (Long, Long) =
    (b._1 + (if (a != null && !a.isNaN) 1L else 0L), b._2 + 1L)
  override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0L) Double.NaN else r._1.toDouble / r._2
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
