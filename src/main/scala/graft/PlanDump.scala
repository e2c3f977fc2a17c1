package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Measurement aid (optimization rounds): write `explain("formatted")`
  * for every declared query — or the SPARK_GRAFT_ONLY subset — to one
  * file per query under a target directory. Plans are captured from the
  * exact Dataset the bench times (same session config, shared frames
  * warmed first, so consumer plans read the warm layout, not a rebuild).
  *
  *   sbt "runMain graft.PlanDump plans/r14 _before"
  *
  * Writes `<dir>/<qNN>_<suffix>.txt`. Never touches bench artifacts.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r14")
    val suffix = if (args.length > 1) args(1) else "_before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(p => n == p || n.startsWith(p + "_"))))
    val spark = GraftSession.prime(GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    var failed = 0
    names.foreach { name =>
      val id = name.takeWhile(_ != '_')
      // NonFatal only (ADVICE r14): an OOM/linkage error must propagate,
      // and any per-query failure makes the run exit nonzero — a fully
      // failed dump must not look successful to a calling script
      try {
        queries.SharedFrames.warmFor(name, spark, sfDir)
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"$id$suffix.txt"),
          plan.getBytes("UTF-8"))
      } catch { case scala.util.control.NonFatal(e) =>
        failed += 1
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
