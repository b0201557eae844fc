package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** Top-level so Spark can derive an Encoder (inner classes can't). */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** §2.10 stream-mode proofs (SURVEY.md §5.2.4): the batch-oracled plans run
  * unchanged under Structured Streaming, and watermark late-drop — the one
  * semantics batch cannot express (`stream_watermark` ⊘) — is observed
  * directly via MemoryStream micro-batches.
  */
class StreamingSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int) = new Timestamp(min * 60000L)

  test("tumbling counts via MemoryStream equal the batch plan on same data") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val data = Seq(
      Ev(1, t(0), 1, "click", 1.0), Ev(2, t(2), 1, "view", 2.0),
      Ev(3, t(6), 2, "click", 3.0), Ev(4, t(11), 2, "click", 4.0))
    mem.addData(data: _*)
    val q = Streams.tumbling(mem.toDF())
      .writeStream.format("memory").queryName("tumb_test")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("tumb_test").orderBy("w_start", "event_type").collect()
    val batch = Streams.tumbling(data.toDF()).orderBy("w_start", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("file-stream source runs the same tumbling plan as the batch scan") {
    // the file-stream source monitors a DIRECTORY of part-files; stage the
    // fixture file into one (the multi-file layout a stream would produce)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      srcDir.resolve("part-0000.parquet"))
    val out = Streams.runAvailableNow(spark, srcDir.toString, Streams.tumbling, "tumb_file")
      .orderBy("w_start", "event_type").collect()
    val batch = Streams.tumbling(Tables.events(spark, TestSpark.sfDir))
      .orderBy("w_start", "event_type").collect()
    assert(out.toSeq === batch.toSeq)
  }

  test("foreachBatch sink lands the complete-mode state; re-runs are idempotent") {
    val run1 = operators.Streams.queries("stream_foreach_batch")(spark, TestSpark.sfDir).collect()
    val run2 = operators.Streams.queries("stream_foreach_batch")(spark, TestSpark.sfDir).collect()
    assert(run1.toSeq === run2.toSeq)
    val batch = Streams.tumbling(Tables.events(spark, TestSpark.sfDir))
      .orderBy("w_start", "event_type").collect()
    assert(run1.toSeq === batch.toSeq)
  }

  test("checkpoint restart resumes offsets and state: no replay, no loss") {
    val src = java.nio.file.Files.createTempDirectory("graft_ck_src").toString
    val ck  = java.nio.file.Files.createTempDirectory("graft_ck_loc").toString
    val plan = (df: org.apache.spark.sql.DataFrame) => df.groupBy("user_id").count()
    // run 1 input: user 1 twice, user 2 once
    Seq(Ev(1, t(0), 1, "click", 1.0), Ev(2, t(1), 1, "click", 1.0),
        Ev(3, t(2), 2, "view", 1.0)).toDF()
      .write.mode("append").parquet(src)
    var run = 1
    val seen = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    def sink(b: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val rows = b.select(col("user_id"), col("count")).as[(Long, Long)].collect()
      seen.synchronized { seen ++= rows.map(r => (run, r._1, r._2)) }
    }
    Streams.runCheckpointed(spark, src, ck, plan)(sink)
    assert(seen.filter(_._1 == 1).map(x => (x._2, x._3)).toSet ===
      Set((1L, 2L), (2L, 1L)))
    // new files land between the stop and the restart
    run = 2
    Seq(Ev(4, t(3), 1, "click", 1.0), Ev(5, t(4), 3, "view", 1.0)).toDF()
      .write.mode("append").parquet(src)
    Streams.runCheckpointed(spark, src, ck, plan)(sink)
    val r2 = seen.filter(_._1 == 2).map(x => (x._2, x._3)).toSet
    // state store recovered: user 1's count continues from 2, not from 0
    assert(r2.contains((1L, 3L)), s"aggregation state lost across restart: $r2")
    // offsets recovered: run-1 files not replayed — user 2 is untouched by
    // run 2's data, so update mode must NOT re-emit it
    assert(!r2.exists(_._2 == 2L), s"run-1 files replayed after restart: $r2")
    assert(r2.contains((3L, 1L)), s"new file's rows must be processed: $r2")
  }

  test("stream-static join enriches micro-batches from the static dim") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, t(0), 10, "click", 1.5), Ev(2, t(1), 10, "view", 2.0),
      Ev(3, t(2), 20, "click", 3.0), Ev(4, t(3), 99, "click", 4.0)) // 99: no dim row
    val dim = Seq((10L, "AUTO"), (20L, "STEEL"))
      .toDF("c_custkey", "c_mktsegment")
    val q = Streams.staticEnrich(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("enrich_test")
      .orderBy("c_mktsegment", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === Seq(("AUTO", "click", 1L, 1.5), ("AUTO", "view", 1L, 2.0),
      ("STEEL", "click", 1L, 3.0)))
  }

  test("watermark drops rows later than the watermark (stream-only semantics)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val plan = Streams.watermarkedTumblingCount(mem.toDF())
    val q = plan.writeStream.format("memory").queryName("wm_test")
      .outputMode("update").start()
    // batch 1: events at 10:00 and 10:20 -> watermark advances to 10:10
    mem.addData(Ev(1, t(600), 1, "click", 1.0), Ev(2, t(620), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 2: 10:05 is behind the 10:10 watermark (its 5-min window
    // [10:05,10:10) closed) -> dropped; 10:30 is on time
    mem.addData(Ev(3, t(605), 1, "click", 1.0), Ev(4, t(630), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val wins = spark.table("wm_test")
      .select(col("w_start").cast("long").as("s"), col("cnt")).as[(Long, Long)]
      .collect().toSeq
    // the late row's window (10:05 -> 36300s) must never appear
    assert(!wins.exists(_._1 == 605 * 60), s"late row leaked: $wins")
    // on-time windows present
    assert(wins.exists(_._1 == 600 * 60) && wins.exists(_._1 == 630 * 60))
  }

  test("windowed top-3 leaderboard: streaming state operator equals batch rank") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val data = (1 to 40).map(i =>
      Ev(i, t(i % 14), i % 5, "click", (i * 37 % 19).toDouble))
    // two chunks → the board must converge across micro-batches, not
    // just within one
    mem.addData(data.take(25): _*)
    mem.addData(data.drop(25): _*)
    val q = Streams.windowTopKStream(mem.toDF())
      .writeStream.format("memory").queryName("topk_test")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // update mode re-emits a window's board each batch that changes it:
    // keep only the LAST emission per (window, rank) — explicit
    // row_number over insertion order (dropDuplicates-after-sort keeps
    // an arbitrary row, not the sorted-first one)
    val wlast = org.apache.spark.sql.expressions.Window
      .partitionBy($"w_start", $"rn").orderBy($"seq".desc)
    val streamed = spark.table("topk_test")
      .withColumn("seq", monotonically_increasing_id())
      .withColumn("k", row_number().over(wlast)).filter($"k" === 1)
      .select("w_start", "event_id", "value", "rn")
      .orderBy("w_start", "rn").collect()
    val batch = Streams.windowTopK(data.toDF())
      .orderBy("w_start", "rn").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("custom-state processor (transformWithState) accumulates across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.runningUserStats(mem.toDF())
      .writeStream.format("memory").queryName("state_test")
      .outputMode("update").start()
    mem.addData(Ev(1, t(0), 7, "click", 1.5), Ev(2, t(1), 7, "click", 2.5))
    q.processAllAvailable()
    mem.addData(Ev(3, t(2), 7, "click", 4.0), Ev(4, t(2), 8, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    // update-mode sink: the LAST snapshot per user carries cumulative state
    val last = spark.table("state_test")
      .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("tot"))
      .orderBy("user_id").collect()
    assert(last(0).getLong(1) === 3)                      // user 7: 2 + 1 events
    assert(last(0).getDouble(2) === 8.0)                  // 1.5+2.5+4.0
    assert(last(1).getLong(1) === 1)
  }

  test("custom-state TTL evicts idle keys: the count restarts after expiry") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // a ProcessingTime-mode stateful query never "settles": the operator
    // keeps requesting batches to advance its clock (that's how timers and
    // TTL expiry fire), so processAllAvailable/AvailableNow would wait
    // forever — the test polls the sink and stops the query manually
    def awaitSinkRows(table: String, n: Long): Unit = {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (spark.table(table).count() < n) {
        assert(System.nanoTime() < deadline,
          s"timed out waiting for $n rows in $table")
        Thread.sleep(100L)
      }
    }
    def counts(table: String): Seq[Long] =
      spark.table(table).filter(col("user_id") === 7)
        .select("n_events").as[Long].collect().toSeq.sorted
    def feed(name: String, ttlMs: Option[Long]): Seq[Long] = {
      val mem = MemoryStream[Ev]
      val q = Streams.runningUserStatsTtl(mem.toDF(), ttlMs)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        mem.addData(Ev(1, t(0), 7, "click", 1.5))
        awaitSinkRows(name, 1)
        // idle PAST the TTL while empty batches advance processing time
        Thread.sleep(1600L)
        mem.addData(Ev(2, t(1), 7, "click", 2.0))
        awaitSinkRows(name, 2)
      } finally q.stop()
      counts(name)
    }
    // TTL'd: user 7's ValueState cells expire during the idle gap, so the
    // second event restarts the accumulation from zero — the eviction
    // semantics the 100 TB state bound rests on
    assert(feed("ttl_test", Some(800L)) === Seq(1L, 1L),
      "idle state must expire between batches")
    // control, same plan shape: no TTL ⇒ the same feed accumulates
    assert(feed("ttl_none_test", None) === Seq(1L, 2L),
      "the TTL-free twin must accumulate")
  }

  test("event-time timers close gap sessions when the watermark passes — never the wall clock") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    // 5-minute gap, 30-minute out-of-orderness tolerance. Timestamps sit
    // WELL past epoch 0: stateful operators drop rows with ts <= the
    // current watermark, and the initial watermark IS 0 — an event at
    // exactly t(0) is "late" before the stream ever starts (found
    // empirically; the same trap applies to ts == watermark with zero
    // tolerance).
    val q = Streams.sessionizeStream(mem.toDF(), gapMs = 300000L,
        delay = "30 minutes")
      .writeStream.format("memory").queryName("sess_timer")
      .outputMode("append").start()
    try {
      // one batch may carry SEVERAL of a key's sessions: u4's two events
      // are 20 min apart (gap 5) — they must NOT merge (the gaps-and-
      // islands definition, same as batch sessionize). u5 opens two
      // sessions 6 min apart that a later in-tolerance event will BRIDGE.
      mem.addData(
        Ev(1, t(10), 1, "click", 1.0),
        Ev(2, t(10), 4, "view", 1.0), Ev(3, t(30), 4, "view", 1.0),
        Ev(4, t(10), 5, "click", 1.0), Ev(5, t(16), 5, "click", 1.0))
      q.processAllAvailable()
      // u1's second event RE-ARMS its one timer (t10+gap → t12+gap) —
      // same open session; u5's out-of-order t13 bridges t10 and t16
      // into ONE session (3 min to each neighbor, both ≤ gap)
      mem.addData(Ev(6, t(12), 1, "click", 1.0), Ev(7, t(13), 5, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("sess_timer").count() === 0,
        "no session may close before the watermark passes a gap")
      // wall-clock idling must NOT close an event-time session (the TTL
      // probe covers the processing-time clock; this is the other one)
      Thread.sleep(1200L)
      q.processAllAvailable()
      assert(spark.table("sess_timer").count() === 0,
        "event-time sessions must ignore the wall clock")
      // a far-future event drives the watermark (t300 - 30min = t270)
      // past every armed timer; u4's ONE firing closes BOTH its sessions
      mem.addData(Ev(8, t(300), 3, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess_timer").orderBy("user_id", "session_start_ms")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(rows === Seq(
        (1L, 2L, t(10).getTime, t(12).getTime), // ONE session — re-arm worked
        (4L, 1L, t(10).getTime, t(10).getTime), // TWO sessions from one batch
        (4L, 1L, t(30).getTime, t(30).getTime),
        (5L, 3L, t(10).getTime, t(16).getTime)), // bridged into ONE
        s"got $rows")
      // u3's session is still open (its timer sits past the watermark)
      assert(!rows.exists(_._1 == 3L))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range join") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = Streams.intervalJoin(
        clicks.toDF().withWatermark("ts", "10 minutes"),
        purchases.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("sj_test")
      .outputMode("append").start()
    clicks.addData(Ev(1, t(20), 1, "click", 0), Ev(2, t(40), 1, "click", 0))
    purchases.addData(Ev(10, t(15), 1, "purchase", 0),   // within 10m of click@20
                      Ev(11, t(39), 1, "purchase", 0),   // within 10m of click@40
                      Ev(12, t(100), 2, "purchase", 0))  // other user / out of range
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sj_test").select("c_id", "p_id")
      .as[(Long, Long)].collect().toSet
    assert(rows === Set((1L, 10L), (2L, 11L)))
  }

  test("transformWithState accumulates ValueState across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.userRunningMax(mem.toDF())
      .writeStream.format("memory").queryName("tws_test")
      .outputMode("update").start()
    mem.addData(Ev(1, t(0), 7, "click", 1.5), Ev(2, t(1), 7, "click", 2.5))
    q.processAllAvailable()
    mem.addData(Ev(3, t(2), 7, "click", 0.5), Ev(4, t(2), 8, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    // update-mode sink: the LAST snapshot per user carries cumulative state
    val last = spark.table("tws_test")
      .groupBy("user_id").agg(max("n_events").as("n"), max("max_value").as("mx"))
      .orderBy("user_id").collect()
    assert(last(0).getLong(1) === 3)          // user 7: 2 + 1 events
    assert(last(0).getDouble(2) === 2.5)      // max(1.5, 2.5, 0.5)
    assert(last(1).getLong(1) === 1)
  }

  test("custom-state batch form equals groupBy aggregation") {
    val df = Seq(Ev(1, t(0), 1, "a", 1.25), Ev(2, t(1), 1, "a", 2.0),
                 Ev(3, t(2), 2, "b", 0.5)).toDF()
    val out = Streams.runningUserStats(df).orderBy("user_id").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 2 && out(0).getDouble(2) === 3.25)
  }

  test("session windows merge events within the 30-minute gap") {
    val df = Seq(
      Ev(1, t(0), 1, "a", 0), Ev(2, t(10), 1, "a", 0),   // session 1 (gap 10m)
      Ev(3, t(60), 1, "a", 0),                            // session 2 (gap 50m)
      Ev(4, t(0), 2, "a", 0)                              // other user
    ).toDF()
    val out = Streams.session(df).orderBy("user_id", "session_start").collect()
    assert(out.length === 3)
    assert(out(0).getLong(3) === 2) // user 1 first session has 2 events
    assert(out(1).getLong(3) === 1)
  }

  test("watermarked sessions emit CLOSED sessions only, once, and evict") {
    // the production eviction shape behind the StreamRehearsal whale rows
    // (PERF.md §12.1): append mode emits a session when the watermark
    // passes its close (+30m gap) and drops its state; sessions still
    // open at end-of-stream stay unemitted — pinned here so the bounded-
    // state claim can't drift from the operator's actual contract
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, t(0), 1, "a", 0), Ev(2, t(10), 1, "a", 0), // session 1: closes t40
      Ev(3, t(120), 1, "a", 0))                        // watermark → t90: still open
    val q = Streams.sessionWatermarked(mem.toDF())
      .writeStream.format("memory").queryName("sess_wm")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("sess_wm").orderBy("session_start").collect()
    assert(out.length === 1, s"only the CLOSED session may emit: ${out.toSeq}")
    assert(out(0).getLong(3) === 2) // both gap-merged events, emitted once
  }

  test("stateful dedup keeps the earliest event per key") {
    val df = Seq(
      Ev(5, t(1), 1, "click", 0), Ev(3, t(1), 1, "click", 0), // ts tie -> min id
      Ev(9, t(0), 1, "click", 0),                              // earliest
      Ev(7, t(5), 2, "click", 0)
    ).toDF()
    val out = Streams.dedupBatch(df).orderBy("user_id").collect()
    assert(out.length === 2)
    assert(out(0).getLong(2) === 9) // earliest ts wins over id order
  }
}
