package graft
import org.apache.spark.sql.SparkSession

/** Measurement aid (optimization rounds): execute each named query and
  * write the AQE FINAL executed plan — the plan the bench actually pays
  * for, after runtime re-optimization (SMJ→SHJ conversion, coalescing,
  * skew splits) — which `explain("formatted")` cannot show (it prints
  * `isFinalPlan=false` before execution).
  *
  *   sbt "runMain graft.FinalPlan plans/r15 _final q96_sorted_neighborhood"
  *
  * Writes `<dir>/<qNN><suffix>.txt`. SPARK_GRAFT_ANALYZE=1 refreshes the
  * ANALYZE profile first (same knob as QTime) so the plan is the
  * stats-hydrated one the bench children run. Never touches bench
  * artifacts. */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r15")
    val suffix = if (args.length > 1) args(1) else "_final"
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val raw = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    raw.sparkContext.setLogLevel("WARN")
    if (sys.env.get("SPARK_GRAFT_ANALYZE").contains("1"))
      graft.plans.StatsStore.analyze(raw, sfDir,
        graft.plans.StatsStore.ProfiledTables)
    val spark = GraftSession.prime(raw)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    var failed = 0
    names.foreach { name =>
      val id = name.takeWhile(_ != '_')
      try {
        queries.SharedFrames.warmFor(name, spark, sfDir)
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.count()
        // executedPlan after an action: AdaptiveSparkPlanExec renders its
        // current (final) physical plan including AQEShuffleRead nodes
        val plan = df.queryExecution.executedPlan.toString
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$id$suffix.txt"),
          plan.getBytes("UTF-8"))
        spark.sharedState.cacheManager.clearCache()
      } catch { case scala.util.control.NonFatal(e) =>
        failed += 1
        System.err.println(s"[finalplan] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
