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
}
