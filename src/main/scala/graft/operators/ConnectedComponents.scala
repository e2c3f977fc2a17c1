package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the clustering step that turns pairwise duplicate evidence (shared
  * blocking keys, verified near-dup pairs) into transitive duplicate
  * clusters, so "keep one canonical doc per cluster" is a groupBy away.
  *
  * Algorithm: every node starts labeled with its own id; each round a
  * node takes the minimum label among itself and its neighbors; stop
  * when a round changes nothing. Rounds are whole-stage DataFrame jobs
  * (join + groupBy on the node id), so each round is one shuffle of the
  * edge list — the driver loop only orchestrates, all data stays
  * distributed. Converges in O(component diameter) rounds; dedup
  * graphs built from star edges (hub = min doc per blocking key) have
  * tiny diameters by construction. For adversarial long-path graphs the
  * standard fix is the large-star/small-star variant (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond"), which shortcuts
  * paths and converges in O(log² n) — same loop shape, different round
  * body; not needed for the dedup-cluster shapes this engine builds.
  */
object ConnectedComponents {

  /** `edges`: two long columns (`src`, `dst`), undirected semantics.
    * Returns (`id`, `comp`): every node appearing in an edge, labeled
    * with the minimum node id reachable from it. Throws if not
    * converged within `maxIters` rounds. */
  def run(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      // every round joins this; persist once (cluster analog: a
      // materialized edge table), localCheckpoint is the local stand-in
      .localCheckpoint()
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    // labels are monotone non-increasing, so Σcomp strictly decreases
    // until the fixpoint: comparing consecutive sums detects convergence
    // with one cheap aggregate per round instead of a diff join. Decimal
    // sum: 10^10 nodes × 10^9 ids would wrap an int64.
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
    var prev = checksum(labels)
    var round = 0
    while (round < maxIters) {
      val nbrMin = und.join(labels, und("dst") === labels("id"))
        .groupBy(und("src").as("id")).agg(min(col("comp")).as("ncomp"))
      val next = labels.as("l").join(nbrMin.as("n"), Seq("id"), "left")
        .select(col("id"),
          least(col("l.comp"), coalesce(col("n.ncomp"), col("l.comp"))).as("comp"))
        .localCheckpoint()
      val cur = checksum(next)
      labels = next
      if (cur.compareTo(prev) == 0) return labels
      prev = cur
      round += 1
    }
    throw new IllegalStateException(
      s"connected components did not converge in $maxIters rounds")
  }
}
