package graft
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    for (name <- args; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(f"$name rep$rep ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    spark.stop()
  }
}
