package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFns._

/** Scratch profiler (not part of the driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.registerFunctions(spark)
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // stage 1: bare postings build (no persist)
    val raw = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(shingleH32(col("text"), 3)).as("h"))
      .distinct()
    t("postings count")(raw.count())
    t("postings count again")(raw.count())
    val p = raw.persist()
    t("persist materialize")(p.count())
    val nd = Tables.documents(spark, dir).agg(count(lit(1)).as("ndocs"))
    val hot = p.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nd))
      .filter(col("df") * 100 > greatest(lit(2500L), col("ndocs")))
      .select(col("h"))
    t("hot")(hot.count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val sh = p.join(broadcast(hot), Seq("h"), "left_anti")
      .withColumn("n_sh", count(lit(1)).over(w))
    t("sh windowed")(sh.count())
    val joined = sh.as("a")
      .join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
    t("join rows")(joined.count())
    val agg = joined
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"),
        max(col("a.n_sh")).as("na"), max(col("b.n_sh")).as("nb"))
      .withColumn("jac",
        round(lit(1e-9) + col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 5))
      .filter(col("jac") >= 0.6)
    t("full agg")(agg.count())
    t("full q29 via entry")(SparkEntry.queries("q29_ngram_jaccard")(spark, dir).count())
    spark.stop()
  }
}
