package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: `runMain graft.QTime q30_minhash_lsh [reps]
  * [explain]`. Times each named query cold (cache cleared between reps,
  * like Bench — with Bench's one exception: the shared postings family is
  * re-warmed UNTIMED before each rep of its consumers, so isolated and
  * pack numbers measure the same warm-postings cost) and optionally
  * prints the formatted physical plan. */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.filter(a => !a.forall(_.isDigit) && a != "explain")
    val reps = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(2)
    val doExplain = args.contains("explain")
    // SPARK_GRAFT_ANALYZE=1: refresh the persisted ANALYZE profile before
    // priming, so isolated timings plan with StatsBroadcastJoins active —
    // the environment Bench's children run in (the parent's analyzeOnce
    // writes graft_table_stats, every child hydrates it). Without this an
    // isolated number can measure a DIFFERENT plan than the pack's.
    val raw = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    raw.sparkContext.setLogLevel("WARN")
    if (sys.env.get("SPARK_GRAFT_ANALYZE").contains("1"))
      graft.plans.StatsStore.analyze(raw, sfDir,
        graft.plans.StatsStore.ProfiledTables)
    val spark = GraftSession.prime(raw)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (doExplain) fn(spark, sfDir).explain("formatted")
      val ts = (1 to reps).map { _ =>
        queries.SharedFrames.warmFor(name, spark, sfDir)
        // same untimed post-warm GC breather as Bench.runPack — pack and
        // isolated numbers must pay (or skip) the same costs
        if (queries.SharedFrames.isConsumer(name)) System.gc()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        sec
      }
      println(f"QTIME $name min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
