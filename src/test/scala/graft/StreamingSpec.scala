package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Structured Streaming: windowed agg equals the batch query; sessionization
  * closes sessions on the event-time gap.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(1704067200000L + min * 60000)

  test("streaming windowed agg (complete mode) matches batch groupBy") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 3.0), Event(4, ts(130), 2, "click", 4.0))
    input.addData(events: _*)
    val q = EventStream.windowedAgg(input.toDF())
      .writeStream.format("memory").queryName("winagg")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("winagg")
      .select("hr_epoch", "event_type", "n", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet
    val expected = events.toDF()
      .groupBy(date_trunc("hour", col("ts")).cast("long").as("hr_epoch"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(got === expected)
    assert(got.size === 3) // h0:click(n=2), h1:view, h2:click
  }

  test("streaming geocell counts (complete mode) match the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    case class Page(doc_id: Long, warc_ts: Timestamp, lon: Double, lat: Double)
    val input = MemoryStream[(Long, Timestamp, Double, Double)]
    val pages = Seq(
      (1L, ts(0), 12.3, 51.2), (2L, ts(5), 12.9, 51.8),  // same geocell n51e012
      (3L, ts(70), -0.5, -0.5),                            // s01w001
      (4L, ts(10), 179.9, -70.4))                          // s71e179
    input.addData(pages: _*)
    val q = EventStream.streamingGeocellCounts(
        input.toDF().toDF("doc_id", "warc_ts", "lon", "lat"))
      .writeStream.format("memory").queryName("geocells")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("geocells").as[(Long, String, Long)].collect().toSet
    val expected = pages.toDF("doc_id", "warc_ts", "lon", "lat")
      .groupBy(date_trunc("hour", col("warc_ts")).cast("long").as("hr_epoch"),
        graft.cells.Cells.geocellCol(col("lon"), col("lat")).as("geocell"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(got === expected)
    assert(got.exists { case (_, cell, n) => cell == "n51e012" && n == 2 })
  }

  test("streaming shelve counts (complete mode) match the batch shelve + agg") {
    implicit val sqlCtx = spark.sqlContext
    val tiles = Seq(
      ("t_a", Seq(10.0, 50.0, 15.0, 50.0, 15.0, 55.0, 10.0, 55.0)),
      ("t_b", Seq(-2.0, -2.0, 2.0, -2.0, 2.0, 2.0, -2.0, 2.0)),
      // overlapping tile: points in the overlap with t_b are multi-match skips
      ("t_b2", Seq(0.0, 0.0, 3.0, 0.0, 3.0, 3.0, 0.0, 3.0))).toDF("tile_name", "ring")
    val input = MemoryStream[(Long, Timestamp, Double, Double)]
    val pages = Seq(
      (1L, ts(0), 12.3, 51.2), (2L, ts(5), 12.9, 51.8), // t_a, same hour
      (3L, ts(70), -0.5, -0.5),                          // t_b, next hour
      (4L, ts(75), 0.5, 0.5),                            // overlap -> skipped
      (5L, ts(80), 170.0, 10.0))                         // no tile -> skipped
    input.addData(pages: _*)
    val q = EventStream.streamingShelveCounts(
        input.toDF().toDF("doc_id", "warc_ts", "lon", "lat"), tiles)
      .writeStream.format("memory").queryName("stream_shelve")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("stream_shelve").as[(Long, String, Long)].collect().toSet
    val batch = graft.ops.PipJoin.shelve(
        pages.toDF("doc_id", "warc_ts", "lon", "lat"), tiles,
        "doc_id", "lon", "lat", "tile_name", "ring")
      .groupBy(date_trunc("hour", col("warc_ts")).cast("long").as("hr_epoch"),
        col("tile_name"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(got === batch)
    assert(got.exists { case (_, t, n) => t == "t_a" && n == 2 })
    assert(!got.exists(_._2 == "t_b2"), "overlap points must be skipped, not double-shelved")
  }

  test("shelve-count stream merges each micro-batch into the Icelite sink (>= 2 batches)") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stream-job").toString
    val table = s"$root/counts"
    val tiles = Seq(
      ("t_a", Seq(10.0, 50.0, 15.0, 50.0, 15.0, 55.0, 10.0, 55.0)),
      ("t_b", Seq(-2.0, -2.0, 2.0, -2.0, 2.0, 2.0, -2.0, 2.0))).toDF("tile_name", "ring")
    val input = MemoryStream[(Long, Timestamp, Double, Double)]
    val q = EventStream.runShelveCountsToIcelite(spark,
      input.toDF().toDF("doc_id", "warc_ts", "lon", "lat"), tiles,
      table, s"$root/ckpt")
    // batch 1: two t_a pages in hour 0
    input.addData((1L, ts(0), 12.3, 51.2), (2L, ts(5), 12.9, 51.8))
    q.processAllAvailable()
    val afterB1 = graft.table.Icelite.read(spark, table)
      .as[(Long, String, Long)].collect().toSet
    assert(afterB1.exists { case (_, t, n) => t == "t_a" && n == 2 })
    // batch 2: one MORE t_a page in hour 0 (updates the window's count via
    // the upsert) plus a t_b page in hour 1 (new window row)
    input.addData((3L, ts(10), 12.5, 51.5), (4L, ts(70), -0.5, -0.5))
    q.processAllAvailable()
    q.stop()
    val got = graft.table.Icelite.read(spark, table)
      .as[(Long, String, Long)].collect().toSet
    val batchTwin = graft.ops.PipJoin.shelve(
        Seq((1L, ts(0), 12.3, 51.2), (2L, ts(5), 12.9, 51.8),
          (3L, ts(10), 12.5, 51.5), (4L, ts(70), -0.5, -0.5))
          .toDF("doc_id", "warc_ts", "lon", "lat"), tiles,
        "doc_id", "lon", "lat", "tile_name", "ring")
      .groupBy(date_trunc("hour", col("warc_ts")).cast("long").as("hr_epoch"),
        col("tile_name"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, String, Long)].collect().toSet
    assert(got === batchTwin, "merged sink must converge to the batch result")
    assert(graft.table.Icelite.currentSnapshotId(table).exists(_ >= 2),
      "each micro-batch must commit a snapshot")
    assert(graft.table.Icelite.verifyLineage(spark, table))
  }

  test("streaming dedup drops re-deliveries within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.streamingDedup(input.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0))
    q.processAllAvailable()
    // re-delivery of event 1 in a later micro-batch (within watermark) + a new event
    input.addData(Event(1, ts(0), 1, "click", 1.0), Event(3, ts(2), 2, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("sessionization closes sessions after the inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(spark, input.toDS(), gapSeconds = 600)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // user 1: two events 5 min apart (one session), then 40 min silence,
    // then another event -> first session closes
    input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "click", 2.0))
    q.processAllAvailable()
    input.addData(Event(3, ts(45), 1, "view", 3.0))
    q.processAllAvailable()
    // advance watermark far enough to time the second session out
    input.addData(Event(4, ts(400), 9, "click", 0.0))
    q.processAllAvailable()
    input.addData(Event(5, ts(900), 9, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessions").as[EventStream.Session].collect()
      .filter(_.user_id == 1).sortBy(_.start_epoch)
    assert(sessions.length >= 1)
    val first = sessions.head
    assert(first.n_events === 2 && first.sum_value === 3.0)
    assert(first.end_epoch - first.start_epoch === 300)
  }
}

/** Streaming near-dup gate: foreachBatch incremental dedup into Icelite. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streamed micro-batches converge to the batch minhash pairs") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("sdedup").toString
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .as[(Long, String, String, String, Long)].collect()
    val input = MemoryStream[(Long, String, String, String, Long)]
    val q = EventStream.runIncrementalDedup(spark,
      input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      s"$root/sig", s"$root/pairs", s"$root/ckpt")
    val (b1, b2) = docs.partition(_._1 % 2 == 0)
    input.addData(b1.toSeq)
    q.processAllAvailable()
    input.addData(b2.toSeq)
    q.processAllAvailable()
    q.stop()
    val got = graft.table.Icelite.read(spark, s"$root/pairs")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val want = graft.text.TextOps.minhashPairs(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet"))
      .as[(Long, Long)].collect().toSet
    assert(got === want, "streamed pair table must equal the batch recompute")
    assert(want.nonEmpty)
    assert(graft.table.Icelite.verifyLineage(spark, s"$root/pairs"))
  }
}
