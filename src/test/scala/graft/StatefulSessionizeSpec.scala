package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.functions._
import graft.streaming.{StatefulSessionize, StreamRunner}
import graft.streaming.StatefulSessionize.{SessionUpdate, UserEvent}

class StatefulSessionizeSpec extends SparkSpec {

  test("stateful session counts across micro-batches match the batch sessionizer") {
    import spark.implicits._
    // split the fixture by time median into two "messages" so per-user
    // state genuinely carries across batch boundaries
    val src = Files.createTempDirectory("graft_sess_src")
    val ckp = Files.createTempDirectory("graft_sess_ckp")
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("ts_ns"))
    val median = ev.stat.approxQuantile("ts_ns", Array(0.5), 0.0).head.toLong
    ev.filter(col("ts_ns") <= median).coalesce(1)
      .write.parquet(s"$src/batch=0")
    ev.filter(col("ts_ns") > median).coalesce(1)
      .write.parquet(s"$src/batch=1")
    // oldest-first file order: batch=0 was written before batch=1
    val schema = spark.read.parquet(s"$src/batch=0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$src/batch=*")

    val finalCounts = new ConcurrentHashMap[Long, (Long, Long)]()
    val q = stream.as[UserEvent]
      .transform(StatefulSessionize.sessionCounts(_))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckp.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[SessionUpdate], _: Long) =>
        batch.collect().foreach(u =>
          finalCounts.put(u.user_id, (u.n_sessions, u.n_events)))
      }
      .start()
    q.awaitTermination(120000)

    val expected = graft.queries.EventOps.q19Sessionize(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(finalCounts.size() == expected.size)
    expected.foreach { case (user, exp) =>
      assert(finalCounts.get(user) == exp, s"user $user")
    }
  }

  test("a cross-batch straggler cannot rewind lastTs and mint a spurious session") {
    // state folds batches directly (the batch face of the same updater):
    // gap = 30 min; on-time at 10:00, straggler at 9:00 (folds, no new
    // session), then on-time at 10:10 — a REWOUND lastTs (9:00) would
    // read 10:10 as > gap away and open session 2
    import spark.implicits._
    val min = 60L * 1000 * 1000 * 1000
    def fold(batches: Seq[Seq[Long]]): (Long, Long) = {
      // run each batch through the streaming updater via the batch path
      var counts: (Long, Long) = (0L, 0L)
      val src = Files.createTempDirectory("graft_sess_late_src")
      val ckp = Files.createTempDirectory("graft_sess_late_ckp")
      batches.zipWithIndex.foreach { case (ts, i) =>
        ts.map(t => UserEvent(1L, t)).toDS().coalesce(1)
          .write.parquet(f"$src/b=$i%02d")
      }
      val schema = spark.read.parquet(s"$src/b=00").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$src/b=*")
      val q = stream.as[UserEvent]
        .transform(StatefulSessionize.sessionCounts(_, gapNs = 30 * min))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckp.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[SessionUpdate], _: Long) =>
          b.collect().foreach(u => counts = (u.n_sessions, u.n_events))
        }
        .start()
      q.awaitTermination(120000)
      counts
    }
    val t10 = 600L * min
    val (sessions, events) = fold(Seq(
      Seq(t10), Seq(t10 - 60 * min), Seq(t10 + 10 * min)))
    assert(events == 3L)
    // the straggler's delta vs lastTs is negative (never > gap), so it
    // folds into the open session; with a MONOTONE lastTs the 10:10
    // event is 10 min from 10:00 — same session. The rewind bug read
    // 10:10 as 70 min from the straggler's 9:00 and minted session 2.
    // NOTE this pins the documented late-data TRADE, not batch parity:
    // q19 over the complete sorted history would count the 9:00 event as
    // its own session (2 total); bounded three-long state cannot
    // retroactively split, so out-of-order delivery degrades to
    // fold-into-current (see the StatefulSessionize header) — parity
    // with q19 is contractual only for in-order delivery (test above)
    assert(sessions == 1L,
      s"10:10 minted a session against a rewound lastTs (got $sessions)")
  }
}
