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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), outDec(sum(dec(col("value")))).as("sum_val"))
        .select(col("window.start").as("w_start"), col("event_type"), col("cnt"), col("sum_val"))
        .orderBy("w_start", "event_type")),
    "stream_sliding" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("cnt"), outDec(sum(dec(col("value")))).as("sum_val"))
        .select(col("window.start").as("w_start"), col("cnt"), col("sum_val"))
        .orderBy("w_start")),
    "stream_session" -> ((s, d) =>
      events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
                col("last_ts"), col("n_events"))
        .orderBy("user_id", "session_start")),
    "stream_dedup" -> ((s, d) => {
      // deterministic stateful-dedup semantics: keep the EARLIEST event per
      // (user_id, event_type) — dropDuplicates' keep-arbitrary-first is not
      // replayable, so the operator is defined order-explicitly
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "ts")
        .orderBy("user_id", "event_type")
    }),
    "stream_watermark" -> ((s, d) =>
      // withWatermark is a no-op in batch (late-drop semantics are
      // stream-only — covered by the MemoryStream spec); the plan is still
      // the real watermarked plan and its batch result oracles as tumbling
      events(s, d)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("w_start"), col("cnt"))
        .orderBy("w_start"))
  )

  val oracles: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT make_timestamp((epoch_us(ts)//300000000)*300000000) AS w_start,
         event_type, count(*) AS cnt,
         CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS sum_val
         FROM events GROUP BY 1, 2
         ORDER BY w_start NULLS FIRST, event_type NULLS FIRST""",
    "stream_sliding" ->
      """WITH buckets AS (
           SELECT make_timestamp((epoch_us(ts)//300000000)*300000000) AS w_start, value FROM events
           UNION ALL
           SELECT make_timestamp((epoch_us(ts)//300000000)*300000000 - 300000000) AS w_start, value FROM events)
         SELECT w_start, count(*) AS cnt,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DECIMAL(18,4)) AS sum_val
         FROM buckets GROUP BY 1 ORDER BY w_start NULLS FIRST""",
    "stream_session" ->
      """WITH marked AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         numbered AS (
           SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marked)
         SELECT user_id, min(ts) AS session_start, max(ts) AS last_ts, count(*) AS n_events
         FROM numbered GROUP BY user_id, sid
         ORDER BY user_id NULLS FIRST, session_start NULLS FIRST""",
    "stream_dedup" ->
      """SELECT user_id, event_type, event_id, ts FROM (
           SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
           FROM events)
         WHERE rn = 1
         ORDER BY user_id NULLS FIRST, event_type NULLS FIRST""",
    "stream_watermark" ->
      """SELECT make_timestamp((epoch_us(ts)//300000000)*300000000) AS w_start,
         count(*) AS cnt
         FROM events GROUP BY 1 ORDER BY w_start NULLS FIRST"""
  )
}
