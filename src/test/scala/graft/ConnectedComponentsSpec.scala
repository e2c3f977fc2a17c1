package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {

  test("path graph collapses to one component over multiple rounds") {
    import spark.implicits._
    // 0-1-2-...-9 chain: min label must walk the full diameter
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = ConnectedComponents.run(edges)
    val labels = comp.select(col("comp")).distinct().as[Long].collect()
    assert(labels.toSeq == Seq(0L))
    assert(comp.count() == 10)
  }

  test("disjoint components keep distinct minimum labels") {
    import spark.implicits._
    val edges = Seq((5L, 3L), (3L, 8L), (20L, 21L), (30L, 20L))
      .toDF("src", "dst")
    val got = ConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 3L, 3L -> 3L, 8L -> 3L,
      20L -> 20L, 21L -> 20L, 30L -> 20L))
  }

  test("reliable-checkpoint mode produces identical labels (cluster contract)") {
    import spark.implicits._
    val edges = Seq((5L, 3L), (3L, 8L), (20L, 21L), (30L, 20L), (1L, 2L))
      .toDF("src", "dst")
    val local = ConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt")
    val sc = spark.sparkContext
    sc.setCheckpointDir(dir.toString)
    try {
      // with a checkpoint dir configured, every lineage cut uses reliable
      // checkpoint() — same labels, durable blocks
      val reliable = ConnectedComponents.run(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == local)
      val alt = ConnectedComponents.runAlternating(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(alt == local)
      // the reliable path actually wrote checkpoint data
      val wrote = java.nio.file.Files.walk(dir).filter(_.toFile.isFile).count()
      assert(wrote > 0, "no checkpoint blocks written in reliable mode")
    } finally {
      // reset for the other suites sharing this session:
      // setCheckpointDir(null) -> Option(null) -> None
      sc.setCheckpointDir(null)
      assert(sc.getCheckpointDir.isEmpty)
    }
  }

  test("non-convergence within maxIters throws") {
    import spark.implicits._
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalStateException] {
      ConnectedComponents.run(edges, maxIters = 2)
    }
  }

  test("alternating (large-star/small-star) agrees with label propagation") {
    import spark.implicits._
    // deterministic pseudo-random graphs of several shapes
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 4
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .toDF("src", "dst")
      val viaProp = ConnectedComponents.run(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaStar = ConnectedComponents.runAlternating(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaStar == viaProp, s"trial $trial")
    }
  }

  test("runAuto switches to the alternating variant when the budget is exhausted") {
    import spark.implicits._
    // diameter-40 path: propagation under a 2-round budget cannot finish
    // (asserted by the maxIters test above), so the guarded dispatch must
    // measure that and fall back — and still produce the exact labels
    val edges = (0L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = ConnectedComponents.runAuto(edges, propagationBudget = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == (0L to 40L).map(_ -> 0L).toMap)
    // a shallow star graph stays on the propagation fast path (converges
    // inside the same tiny budget, so no fallback can have happened)
    val star = Seq((0L, 5L), (0L, 9L), (0L, 7L)).toDF("src", "dst")
    val viaAuto = ConnectedComponents.runAuto(star, propagationBudget = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAuto == Map(0L -> 0L, 5L -> 0L, 9L -> 0L, 7L -> 0L))
  }

  test("alternating variant collapses a long path in few rounds") {
    import spark.implicits._
    // diameter-40 path: label propagation would need > 25 rounds, the
    // alternating algorithm converges within its default budget
    val edges = (0L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = ConnectedComponents.runAlternating(edges)
    import org.apache.spark.sql.functions.col
    assert(comp.select(col("comp")).distinct().count() == 1)
    assert(comp.count() == 41)
  }
}
