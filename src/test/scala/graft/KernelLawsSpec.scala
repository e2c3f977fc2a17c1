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
}
