package graft

/** The round-in-progress numbering convention, shared by
  * [[Bench]].appendHistory and [[ScaleProbe]] so the two artifacts can
  * never drift apart: SPARK_GRAFT_ROUND if the driver set it (a
  * malformed value is ignored, never fatal — a probe must not abort
  * artifact-less over an env typo), else the latest completed
  * BENCH_rNN.json artifact + 1. Artifact-derived, NOT history-derived:
  * BENCH_HISTORY.jsonl already carries the in-progress round's rows once
  * the round's first bench has run, so a history-based latest+1 would
  * label anything running after Bench one round ahead.
  */
object Rounds {
  def inProgress(): Int =
    sys.env.get("SPARK_GRAFT_ROUND").flatMap(_.toIntOption)
      .getOrElse(latestBenchArtifact() + 1)

  /** Latest completed BENCH_rNN.json artifact number (0 if none). */
  def latestBenchArtifact(): Int = try {
    import scala.jdk.CollectionConverters._
    val pat = java.util.regex.Pattern.compile("BENCH_r(\\d+)\\.json")
    val stream = java.nio.file.Files.list(java.nio.file.Paths.get("."))
    try stream.iterator().asScala
      .map(p => pat.matcher(p.getFileName.toString))
      .filter(_.matches()).map(_.group(1).toInt)
      .foldLeft(0)(math.max)
    finally stream.close() // Files.list holds a directory handle
  } catch { case scala.util.control.NonFatal(_) => 0 }
}
