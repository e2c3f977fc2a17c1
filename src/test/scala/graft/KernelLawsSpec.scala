package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.functions.TextFns._

/** Property-style tests (seeded random inputs, same style as
  * WorklistLawsSpec) for the native text kernels: the fixture-based
  * bit-equality specs prove the kernels on REAL corpus shapes; these
  * prove them on adversarial ones — empty strings, space runs, unicode,
  * single chars, long tokens — against the declarative forms they
  * replace. One Spark job per kernel (all cases in one frame). */
class KernelLawsSpec extends SparkSpec {

  private def randomTexts(rnd: Random, n: Int): Seq[String] = {
    val alphabets = Seq("ab", "xyz", "aé漢", "a b", " ")
    (0 until n).map { _ =>
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val len = rnd.nextInt(40)
      (0 until len).map { _ =>
        if (rnd.nextInt(4) == 0) ' '
        else alpha.charAt(rnd.nextInt(alpha.length))
      }.mkString
    } ++ Seq("", " ", "  ", "a", " a ", "a  b", "é é", "漢 字 漢")
  }

  test("ws_tokens == split+filter on adversarial random strings") {
    import spark.implicits._
    val texts = randomTexts(new Random(7), 300)
    val df = texts.toDF("text")
      .withColumn("native", tokens(col("text")))
      .withColumn("decl", filter(split(col("text"), " "), t => length(t) > lit(0)))
    assert(df.filter(not(col("native") <=> col("decl"))).count() == 0)
  }

  test("shingle_h32 == declarative shingle+hash on adversarial strings") {
    import spark.implicits._
    val texts = randomTexts(new Random(11), 300)
    val decl = transform(
      shingles(filter(split(col("text"), " "), t => length(t) > lit(0)), 3),
      s => conv(substring(md5(s), 1, 8), 16, 10).cast("long"))
    // suspend the md5-h32 rewrite rule: it must not rewrite the
    // declarative comparison side (see TextFnsSpec)
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == graft.plans.RewriteMd5H32)
    try {
      val df = texts.toDF("text")
        .withColumn("native", shingleH32(col("text"), 3))
        .withColumn("decl", decl)
      assert(df.filter(not(col("native") <=> col("decl"))).count() == 0)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("rolling_fp == declarative fold on random token arrays") {
    import spark.implicits._
    val rnd = new Random(13)
    val arrays = (0 until 200).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => s"t${rnd.nextInt(30)}")
    } :+ Seq.empty[String]
    val df = arrays.toDF("toks")
      .withColumn("native", rollingFp(col("toks")))
      .withColumn("decl",
        aggregate(transform(col("toks"), h32 _), lit(0L),
          (acc, h) => (acc * 131L + h) % P))
    assert(df.filter(not(col("native") <=> col("decl"))).count() == 0)
  }

  test("VecFold sum/min/max == posexplode + groupBy(pos) on random vectors") {
    // the centroid/quantizer kernels' law: the dim-width fold buffer must
    // agree element-wise with the declarative per-position aggregation it
    // replaces — across groups of different sizes, negative values, and
    // partial-merge boundaries (8 partitions force merges). Tolerance is
    // ULP-scale: the two sum orders differ, which is exactly the property
    // consumers round away at 6 dp.
    import org.apache.spark.sql.functions.udaf
    val rnd = new scala.util.Random(29)
    val dim = 16
    val rows = (0 until 600).map { i =>
      (i % 7, Seq.fill(dim)(rnd.nextDouble() * 20 - 10))
    }
    import spark.implicits._
    val df = rows.toDF("g", "v").repartition(8).persist()
    val folded = df.groupBy(col("g"))
      .agg(udaf(graft.functions.VecSum).apply(col("v")).as("s"),
        udaf(graft.functions.VecMin).apply(col("v")).as("mn"),
        udaf(graft.functions.VecMax).apply(col("v")).as("mx"))
      .collect().map(r => r.getInt(0) ->
        (r.getSeq[Double](1), r.getSeq[Double](2), r.getSeq[Double](3))).toMap
    val decl = df.select(col("g"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("g"), col("pos"))
      .agg(sum(col("x")).as("s"), min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect().groupBy(_.getInt(0)).map { case (g, rs) =>
        val byPos = rs.map(r => r.getInt(1) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
        g -> (0 until dim).map(byPos)
      }
    decl.foreach { case (g, exp) =>
      val (s, mn, mx) = folded(g)
      (0 until dim).foreach { i =>
        assert(math.abs(s(i) - exp(i)._1) < 1e-9, s"sum g=$g pos=$i")
        assert(mn(i) == exp(i)._2, s"min g=$g pos=$i")
        assert(mx(i) == exp(i)._3, s"max g=$g pos=$i")
      }
    }
    df.unpersist()
  }

  test("VecFold: null vectors ignored (count(v) divisor), zero-length throws") {
    // the centroid divisor contract: a NULL vector contributes neither to
    // the sum nor to count(v) — dividing by count(*) would silently
    // deflate the centroid — while a zero-LENGTH vector fails loudly
    // (it is indistinguishable from the empty zero-buffer, so it would
    // otherwise bypass the ragged-length guard when it arrives first).
    import org.apache.spark.sql.functions.udaf
    import spark.implicits._
    val withNull = Seq((0, Option(Seq(1.0, 2.0))), (0, None),
      (0, Option(Seq(3.0, 4.0)))).toDF("g", "v")
    val r = withNull.groupBy(col("g"))
      .agg(udaf(graft.functions.VecSum).apply(col("v")).as("s"),
        count(col("v")).as("nv"))
      .head()
    assert(r.getSeq[Double](1) == Seq(4.0, 6.0))
    assert(r.getLong(2) == 2L)
    val withEmpty = Seq((0, Seq(1.0)), (0, Seq.empty[Double])).toDF("g", "v")
    val e = intercept[Throwable] {
      withEmpty.groupBy(col("g"))
        .agg(udaf(graft.functions.VecSum).apply(col("v"))).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("zero-length input vector")),
      s"expected the VecFold zero-length guard, got: ${chain(e).mkString(" | ")}")
  }
}
