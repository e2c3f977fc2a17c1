package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.functions._
import graft.streaming.StreamRunner

class StreamRunnerSpec extends SparkSpec {

  /** Stage the sf0.001 events parquet as N "messages" (files) in a fresh
    * source dir, mirroring one file per arriving message. */
  private def stageMessages(n: Int): (String, String) = {
    val src = Files.createTempDirectory("graft_stream_src")
    val ckp = Files.createTempDirectory("graft_stream_ckp")
    val eventsFile = Paths.get(s"$sf/events.parquet") // single-file fixture
    (1 to n).foreach { i =>
      Files.copy(eventsFile, src.resolve(s"msg_$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    (src.toString, ckp.toString)
  }

  // Schema must keep the on-file column names (parquet matches by name);
  // the ts -> ts_ns rename happens on the streaming frame.
  private def eventsSchema = spark.read.parquet(s"$sf/events.parquet").schema

  test("one job per message: sequential foreachBatch over file stream") {
    val (src, ckp) = stageMessages(2)
    val batches = new ConcurrentLinkedQueue[(Long, Long)]()
    val stream = StreamRunner.fileStream(spark, src, eventsSchema)
    val q = StreamRunner.runPerMessage(stream, ckp) { (batch, id) =>
      batches.add((id, batch.count()))
    }
    q.awaitTermination(120000)
    val perFile = spark.read.parquet(s"$sf/events.parquet").count()
    val seen = batches.toArray(Array.empty[(Long, Long)]).toSeq.sortBy(_._1)
    // maxFilesPerTrigger=1 -> one batch per staged message, in order
    assert(seen.map(_._1) == Seq(0L, 1L))
    assert(seen.map(_._2).sum == 2 * perFile)
  }

  test("watermarked hourly aggregation matches the batch computation") {
    val (src, ckp) = stageMessages(1)
    val stream = StreamRunner.fileStream(spark, src, eventsSchema)
      .withColumnRenamed("ts", "ts_ns")
    val q = StreamRunner.runAggregate(
      StreamRunner.hourlyVolume(stream), "hourly_test", ckp)
    q.awaitTermination(120000)
    val streamed = spark.table("hourly_test")
      .orderBy(col("hour"), col("event_type")).collect()
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour"), col("event_type")).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getTimestamp(0) == b.getTimestamp(0))
      assert(s.getString(1) == b.getString(1))
      assert(s.getLong(2) == b.getLong(2))
      assert(math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-6)
    }
  }

  test("streaming dedup drops re-delivered messages across batches") {
    // the same message file staged twice = an exact re-delivery
    val (src, ckp) = stageMessages(2)
    val stream = StreamRunner.fileStream(spark, src, eventsSchema)
      .withColumnRenamed("ts", "ts_ns")
    val total = new java.util.concurrent.atomic.AtomicLong()
    val q = StreamRunner.dedupStream(stream, Seq("event_id"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        total.addAndGet(batch.count()); ()
      }
      .start()
    q.awaitTermination(120000)
    val perFile = spark.read.parquet(s"$sf/events.parquet").count()
    // both copies streamed, but every event_id passed through exactly once
    assert(total.get() == perFile)
  }

  test("runMessages: generate_messages -> message_to_jobs -> process_jobs") {
    import graft.pipeline._
    val src = Files.createTempDirectory("graft_msg_src")
    val ckp = Files.createTempDirectory("graft_msg_ckp")
    // two posttroll-style messages, each naming a real parquet input
    Seq("region" -> "noaa15", "nation" -> "noaa19").zipWithIndex.foreach {
      case ((table, platform), i) =>
        Files.writeString(src.resolve(s"msg_$i.json"),
          s"""{"type": "file", "data": {"uri": "$sf/$table.parquet",
             |  "platform_name": "$platform"}}""".stripMargin)
    }
    val spec = ProductList(areas = Seq(
      AreaSpec(Some("euro"), products = Seq(ProductSpec("scene")))))
    val done = new ConcurrentLinkedQueue[(String, Long)]()
    val q = StreamRunner.runMessages(
      StreamRunner.messageStream(spark, src.toString), spec, ckp.toString,
      paths => Seq(Plugins.CreateScene(paths))) { (json, reports) =>
        val ctx = reports.head.finalCtx
        assert(ctx.aborted.isEmpty, s"job aborted: ${ctx.aborted}")
        // input_mda flowed from the message into the context
        assert(json.contains(ctx.metadata("platform_name")))
        done.add((ctx.metadata("platform_name"), ctx.frames(None).count()))
    }
    q.awaitTermination(120000)
    val seen = done.toArray(Array.empty[(String, Long)]).toMap
    // one job per message, sequentially; each scene read its own input
    assert(seen == Map(
      "noaa15" -> spark.read.parquet(s"$sf/region.parquet").count(),
      "noaa19" -> spark.read.parquet(s"$sf/nation.parquet").count()))
  }

  test("stream-static enrichment joins each batch against a dimension") {
    val (src, ckp) = stageMessages(1)
    val stream = StreamRunner.fileStream(spark, src, eventsSchema)
    // static dim: event_type -> weight
    import spark.implicits._
    val dim = Seq(("click", 1), ("view", 2), ("purchase", 3), ("signup", 4),
      ("error", 5)).toDF("event_type", "weight")
    val total = new java.util.concurrent.atomic.AtomicLong()
    val matched = new java.util.concurrent.atomic.AtomicLong()
    val q = StreamRunner.runPerMessage(
      StreamRunner.enrich(stream, dim, Seq("event_type")), ckp) { (batch, _) =>
        total.addAndGet(batch.count())
        matched.addAndGet(batch.filter(col("weight").isNotNull).count()); ()
    }
    q.awaitTermination(120000)
    val expected = spark.read.parquet(s"$sf/events.parquet")
      .join(dim, Seq("event_type")).count()
    assert(total.get() == expected && matched.get() == expected)
  }

  test("graceful stop terminates a continuous query") {
    val (src, ckp) = stageMessages(1)
    val stream = StreamRunner.fileStream(spark, src, eventsSchema)
    val q = StreamRunner.runPerMessage(stream, ckp, availableNow = false) {
      (_, _) => ()
    }
    // let it process the backlog, then drain
    Thread.sleep(2000)
    assert(StreamRunner.stopGracefully(q))
    assert(!q.isActive)
  }
}
