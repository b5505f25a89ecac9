package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.CoreQueries.stableSum

/** Event-stream queries: nested JSON transforms (the Mongo-path analog,
  * SURVEY §2.7) and the batch equivalent of the streaming windowed
  * aggregation (§2.10).
  */
object EventQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // N1: nested/JSON field transform — extract + anonymize a nested
    // value (the reference's dotted-path document transform,
    // source/mongodb.rs:127-230, over a JSON column).
    "n1_json_transform" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_value"),
          md5(get_json_object(col("props"), "$.k")).as("k_redacted"))),

    // N2: array wildcard transform `$[]` (source/mongodb.rs:232-254):
    // apply an expression to every element of an array — here the
    // tokenized document text, uppercased then re-counted.
    "n2_array_wildcard" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(filter(
            transform(split(col("text"), "\\s+"), t => upper(t)),
            t => t.startsWith("A"))).as("n_upper_a"))),

    // Tumbling-window aggregation, batch form (date_trunc both engines).
    "g5_windowed_counts" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), stableSum(col("value")).as("total_value"))),

    // G2-shaped progress aggregation over the event stream per user.
    "g2_progress_by_user" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"), stableSum(col("value")).as("total_value"))
        .filter(col("n_events") > 10)),

    // Sessionization: 6-hour-gap session windows per user (batch form of
    // the Structured-Streaming session_window state op; a new session
    // starts when the gap to the previous event is >= the timeout,
    // which the oracle mirrors as gaps-and-islands SQL). Beyond the
    // reference, like all g* stream analytics.
    "g6_session_windows" -> ((s, dir) => {
      val sessions = Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
        .agg(count(lit(1)).as("n_events"))
      sessions.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"),
          sum(col("n_events")).as("n_events_total"))
    }),

    // Funnel stages per signed-up user: did a view / a purchase follow
    // the user's FIRST signup? Two aggs + one broadcast-size join —
    // anchor timestamps are one row per user, the event scan stays the
    // only corpus-sized pass per stage.
    // Retention cohorts: users grouped by first-activity day; per
    // (cohort, day-offset) distinct active users — the cohort matrix.
    // Two aggs + one join on the per-user anchor; the event scan is
    // the only corpus-sized pass.
    "g8_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), to_date(col("ts")).as("day"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      ev.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    }),

    "g7_funnel_stages" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val anchor = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      ev.join(anchor, Seq("user_id"))
        .groupBy(col("user_id"), col("t0"))
        .agg(
          max(when(col("event_type") === "view" && col("ts") >= col("t0"), 1)
            .otherwise(0)).as("viewed_after"),
          max(when(col("event_type") === "purchase" && col("ts") >= col("t0"), 1)
            .otherwise(0)).as("purchased_after"))
        .select(col("user_id"), col("t0"), col("viewed_after"), col("purchased_after"))
    })
  )

  val oracle: Map[String, String] = Map(
    "n1_json_transform" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value, " +
        "md5(json_extract_string(props, '$.k')) AS k_redacted FROM events"),
    "n2_array_wildcard" ->
      ("SELECT doc_id, len(list_filter(list_transform(regexp_split_to_array(text, '\\s+'), " +
        "t -> upper(t)), t -> starts_with(t, 'A'))) AS n_upper_a FROM documents"),
    "g5_windowed_counts" ->
      ("SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1, 2"),
    "g2_progress_by_user" ->
      ("SELECT user_id, COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY user_id HAVING COUNT(*) > 10"),
    "g8_retention" ->
      ("""WITH ract AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         |rc AS (SELECT user_id, min(day) AS cohort_day FROM ract GROUP BY 1)
         |SELECT rc.cohort_day, CAST(date_diff('day', rc.cohort_day, a.day) AS INT) AS day_offset,
         |  COUNT(DISTINCT a.user_id) AS n_active
         |FROM ract a JOIN rc USING (user_id) GROUP BY 1, 2""".stripMargin),
    "g7_funnel_stages" ->
      ("""WITH fanchor AS (SELECT user_id, min(ts) AS t0 FROM events
         |  WHERE event_type = 'signup' GROUP BY 1)
         |SELECT e.user_id, a.t0,
         |  max(CASE WHEN e.event_type = 'view' AND e.ts >= a.t0 THEN 1 ELSE 0 END) AS viewed_after,
         |  max(CASE WHEN e.event_type = 'purchase' AND e.ts >= a.t0 THEN 1 ELSE 0 END) AS purchased_after
         |FROM events e JOIN fanchor a USING (user_id)
         |GROUP BY 1, 2""".stripMargin),
    "g6_session_windows" ->
      ("""WITH o AS (SELECT user_id, ts, event_id,
         |  CASE WHEN lag(ts) OVER w IS NULL
         |         OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR THEN 1 ELSE 0 END AS new_s
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s AS (SELECT user_id,
         |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM o),
         |c AS (SELECT user_id, sid, COUNT(*) AS n FROM s GROUP BY 1, 2)
         |SELECT user_id, COUNT(*) AS n_sessions, MAX(n) AS max_session_events,
         |  CAST(SUM(n) AS BIGINT) AS n_events_total
         |FROM c GROUP BY 1""".stripMargin)
  )
}
