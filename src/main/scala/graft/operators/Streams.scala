package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** §2.10 streaming / event-time operators, batch-equivalent formulations
  * (SURVEY.md): Structured Streaming evaluates the same logical plans in
  * stream mode — `graft.streaming.Streams` exposes the readStream builds of
  * the identical plans, exercised by the MemoryStream/availableNow specs.
  * Here each key runs the batch form so the DuckDB oracle can check it.
  *
  * Every query flows through the ns→µs shim in `Tables.events` (§1.4.1).
  */
object Streams {

  // One plan definition serves batch and stream: bodies live in
  // graft.streaming.Streams; here they run on the batch scan (ordered for
  // the oracle), there on readStream (proved by the streaming specs).
  import graft.streaming.{Streams => P}

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> ((s, d) =>
      P.tumbling(events(s, d)).orderBy("w_start", "event_type")),
    "stream_window_topk" -> ((s, d) =>
      // top-3 events per 5-minute tumbling window by value — the
      // windowed-leaderboard shape (trending items / top spenders per
      // interval). Batch form here (DuckDB-oracled); the STREAMING form
      // is P.windowTopKStream — flatMapGroupsWithState with O(3) state
      // per window — proved equal to this plan in StreamingSpec.
      P.windowTopK(events(s, d)).orderBy("w_start", "rn")),
    "stream_sliding" -> ((s, d) =>
      P.sliding(events(s, d)).orderBy("w_start")),
    "stream_session" -> ((s, d) =>
      P.session(events(s, d)).orderBy("user_id", "session_start")),
    "stream_dedup" -> ((s, d) =>
      // deterministic stateful-dedup semantics: keep the EARLIEST event per
      // (user_id, event_type) — dropDuplicates' keep-arbitrary-first is not
      // replayable, so the operator is defined order-explicitly
      P.dedupBatch(events(s, d)).orderBy("user_id", "event_type")),
    "stream_watermark" -> ((s, d) =>
      // withWatermark is a no-op in batch (late-drop semantics are
      // stream-only — covered by the MemoryStream spec); the plan is still
      // the real watermarked plan and its batch result oracles as tumbling
      P.watermarkedTumblingCount(events(s, d)).orderBy("w_start")),
    "stream_custom_state" -> ((s, d) =>
      // transformWithState custom-state op (ported from
      // flatMapGroupsWithState, round 13 — STREAMCHECK measured 4.8× vs
      // 1.3× p50 growth on 10× events/batch); batch form = one big
      // micro-batch over empty state, so the per-user totals oracle exactly
      P.runningUserStats(events(s, d)).orderBy("user_id")),
    "stream_tws" -> ((s, d) =>
      // Spark 4 transformWithState (ValueState processor); batch form =
      // one pass over empty state → per-user totals oracle exactly
      P.userRunningMax(events(s, d)).orderBy("user_id")),
    "stream_foreach_batch" -> ((s, d) => {
      // a REAL streaming execution end-to-end: file-stream source over the
      // staged fixture, the tumbling plan, and a foreachBatch parquet sink
      // (the production write path — per-batch idempotent overwrite), then
      // the sink is read back for the oracle compare. AvailableNow drains
      // the source and terminates, so the key is deterministic.
      val src = new java.io.File(s"${Relational.exportDir}/events_stream")
      src.mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(graft.Tables.path(d, "events")),
        src.toPath.resolve("part-0000.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      graft.streaming.Streams.runForeachBatch(s, src.getPath, P.tumbling,
          s"${Relational.exportDir}/events_stream_sink")
        .orderBy("w_start", "event_type")
    }),
    "stream_join_static" -> ((s, d) =>
      // stream-static dim enrichment (state-free; dim broadcast per batch);
      // batch form = the same join over the full scan
      P.staticEnrich(events(s, d), customer(s, d))
        .orderBy("c_mktsegment", "event_type")),
    "stream_interval_join" -> ((s, d) => {
      val ev = events(s, d)
      P.intervalJoin(ev.filter(col("event_type") === "click"),
                     ev.filter(col("event_type") === "purchase"))
        .orderBy("c_id", "p_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // identical tumbling semantics — the sink path is what's under test
    "stream_foreach_batch" ->
      """SELECT make_timestamp((epoch_us(ts)//300000000)*300000000) AS w_start,
         event_type, count(*) AS cnt,
         CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_val
         FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
         ORDER BY w_start NULLS FIRST, event_type NULLS FIRST""",
    "stream_join_static" ->
      """SELECT c_mktsegment, event_type, count(*) AS cnt,
         CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_val
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1, 2
         ORDER BY c_mktsegment NULLS FIRST, event_type NULLS FIRST""",
    "stream_window_topk" ->
      """WITH t AS (
           SELECT make_timestamp((epoch_us(ts)//300000000)*300000000) AS w_start,
             event_id, value
           FROM events WHERE ts IS NOT NULL),
         r AS (
           SELECT w_start, event_id, value,
             row_number() OVER (PARTITION BY w_start
               ORDER BY value DESC NULLS LAST, event_id NULLS FIRST) AS rn
           FROM t)
         SELECT w_start, event_id, value, rn FROM r WHERE rn <= 3
         ORDER BY w_start NULLS FIRST, rn NULLS FIRST""",
    "stream_tumbling" ->
      """SELECT make_timestamp((epoch_us(ts)//300000000)*300000000) AS w_start,
         event_type, count(*) AS cnt,
         CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_val
         FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
         ORDER BY w_start NULLS FIRST, event_type NULLS FIRST""",
    "stream_sliding" ->
      """WITH buckets AS (
           SELECT make_timestamp((epoch_us(ts)//300000000)*300000000) AS w_start, value
           FROM events WHERE ts IS NOT NULL
           UNION ALL
           SELECT make_timestamp((epoch_us(ts)//300000000)*300000000 - 300000000) AS w_start, value
           FROM events WHERE ts IS NOT NULL)
         SELECT w_start, count(*) AS cnt,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_val
         FROM buckets GROUP BY 1 ORDER BY w_start NULLS FIRST""",
    "stream_session" ->
      """WITH marked AS (
           SELECT user_id, ts,
             -- strictly-greater: Spark's session_window treats an event at
             -- EXACTLY gap distance as part of the session (range [start,
             -- last+gap] inclusive at merge — ties-fixture verified)
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
           FROM events WHERE ts IS NOT NULL
           WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST)),
         numbered AS (
           SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marked)
         SELECT user_id, min(ts) AS session_start, max(ts) AS last_ts, count(*) AS n_events
         FROM numbered GROUP BY user_id, sid
         ORDER BY user_id NULLS FIRST, session_start NULLS FIRST""",
    "stream_dedup" ->
      """SELECT user_id, event_type, event_id, ts FROM (
           SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS rn
           FROM events)
         WHERE rn = 1
         ORDER BY user_id NULLS FIRST, event_type NULLS FIRST""",
    "stream_watermark" ->
      """SELECT make_timestamp((epoch_us(ts)//300000000)*300000000) AS w_start,
         count(*) AS cnt
         FROM events WHERE ts IS NOT NULL
         GROUP BY 1 ORDER BY w_start NULLS FIRST""",
    "stream_custom_state" ->
      """SELECT user_id, count(*) AS n_events,
         CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_value
         FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
         GROUP BY 1 ORDER BY user_id NULLS FIRST""",
    "stream_tws" ->
      """SELECT user_id, count(*) AS n_events, max(value) AS max_value
         FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
         GROUP BY 1 ORDER BY user_id NULLS FIRST""",
    "stream_interval_join" ->
      """SELECT c.event_id AS c_id, c.user_id, c.ts AS c_ts,
              p.event_id AS p_id, p.ts AS p_ts
         FROM (SELECT * FROM events WHERE event_type = 'click') c
         JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
         ON c.user_id = p.user_id
           AND p.ts <= c.ts AND p.ts >= c.ts - INTERVAL 10 MINUTE
         ORDER BY c_id NULLS FIRST, p_id NULLS FIRST"""
  )
}
