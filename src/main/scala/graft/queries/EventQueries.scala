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
        .filter(col("n_events") > 10))
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
        "FROM events GROUP BY user_id HAVING COUNT(*) > 10")
  )
}
