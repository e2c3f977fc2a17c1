package graft

import org.apache.spark.sql.functions._
import graft.functions.ValidFraction

class ValidFractionSpec extends SparkSpec {

  test("udaf counts null and NaN as fill, matches avg(isNotNull) when NaN-free") {
    import spark.implicits._
    val vf = udaf(ValidFraction)
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", null), ("a", Double.NaN), ("a", 2.0),
      ("b", 5.0), ("b", 6.0),
      ("c", null)
    ).toDF("k", "v")
    val got = df.groupBy($"k").agg(vf($"v").as("frac"))
      .orderBy($"k").as[(String, Double)].collect()
    assert(got(0) == ("a", 0.5))
    assert(got(1) == ("b", 1.0))
    assert(got(2) == ("c", 0.0)) // all-fill group: 0 valid of 1
  }

  test("agrees with the relational form on fixture data (no NaNs there)") {
    import spark.implicits._
    val vf = udaf(ValidFraction)
    val raster = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_returnflag".as("area"),
        when($"l_discount" > 0.08, lit(null).cast("double"))
          .otherwise($"l_quantity".cast("double")).as("value"))
    val typed = raster.groupBy($"area").agg(round(vf($"value"), 5).as("frac"))
    val relational = raster.groupBy($"area")
      .agg(round(avg($"value".isNotNull.cast("double")), 5).as("frac"))
    assert(typed.orderBy($"area").collect().toSeq ==
      relational.orderBy($"area").collect().toSeq)
  }
}
