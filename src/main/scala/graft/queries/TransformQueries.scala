package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.transform.Transformers._

/** One oracle-checked query per transformer (SURVEY §2.6, T1–T10).
  *
  * Each selects the table key plus the transformed column so the DuckDB
  * hash compare covers every output cell. The full dump-pipeline usage
  * (`applyBindings`) is exercised by `t_pipeline_bindings`, which
  * transforms several customer columns at once — the reference's
  * `transform_columns` path (`source/postgres.rs:349-431`).
  */
object TransformQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_email" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), email(col("c_name")).as("c_email"))),

    "t2_first_name" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), firstName(col("c_name")).as("c_first_name"))),

    "t3_phone_number" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), phoneNumber(col("c_name")).as("c_phone"))),

    "t4_credit_card" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), creditCard(col("c_name")).as("c_card"))),

    "t5_random_samelen" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          randomSameLen(col("c_mktsegment")).as("c_seg_random"),
          length(col("c_mktsegment")).as("orig_len"))),

    "t5_random_long" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), randomLong(col("c_custkey")).as("k_random"))),

    "t6_keep_first_char" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          keepFirstChar(col("c_name")).as("c_name_first"),
          keepFirstDigit(col("c_custkey")).as("c_key_digit"))),

    "t7_transient" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), transient(col("c_name")).as("c_name"))),

    "t8_redacted" -> ((s, dir) =>
      Tables.customer(s, dir)
        .select(
          col("c_custkey"),
          redacted(col("c_name")).as("c_name_red"),
          redacted(col("c_mktsegment"), '#', 4).as("c_seg_red"))),

    // T9: custom transformer plugin, the Spark analog of the WASM
    // extension point — registers the reference's own example
    // (reverse-string, `examples/wasm/`) and applies it through a
    // binding like any built-in.
    "t9_custom_plugin" -> ((s, dir) => {
      import graft.model.TransformerBinding
      graft.transform.Transformers.registerCustom("reverse-string", c => reverse(c))
      graft.transform.Transformers.applyBindings(
        Tables.customer(s, dir),
        Seq(TransformerBinding("public", "customer", "c_name", "reverse-string")))
        .select(col("c_custkey"), col("c_name"))
    }),

    "t10_random_date" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), randomDate(col("o_orderkey")).as("o_fake_date"))),

    // The whole-table binding path: several columns transformed in one
    // select, as the dump pipeline does per table.
    "t_pipeline_bindings" -> ((s, dir) => {
      import graft.model.TransformerBinding
      val bindings = Seq(
        TransformerBinding("public", "customer", "c_name", "email"),
        TransformerBinding("public", "customer", "c_mktsegment", "redacted"),
        TransformerBinding("public", "customer", "c_custkey", "keep-first-char"))
      applyBindings(Tables.customer(s, dir), bindings)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_nationkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "t1_email" ->
      s"SELECT c_custkey, ${emailSql("c_name")} AS c_email FROM customer",
    "t2_first_name" ->
      s"SELECT c_custkey, ${firstNameSql("c_name")} AS c_first_name FROM customer",
    "t3_phone_number" ->
      s"SELECT c_custkey, ${phoneNumberSql("c_name")} AS c_phone FROM customer",
    "t4_credit_card" ->
      s"SELECT c_custkey, ${creditCardSql("c_name")} AS c_card FROM customer",
    "t5_random_samelen" ->
      (s"SELECT c_custkey, ${randomSameLenSql("c_mktsegment")} AS c_seg_random, " +
        "length(c_mktsegment) AS orig_len FROM customer"),
    "t5_random_long" ->
      s"SELECT c_custkey, ${randomLongSql("c_custkey")} AS k_random FROM customer",
    "t6_keep_first_char" ->
      (s"SELECT c_custkey, ${keepFirstCharSql("c_name")} AS c_name_first, " +
        s"${keepFirstDigitSql("c_custkey")} AS c_key_digit FROM customer"),
    "t7_transient" ->
      "SELECT c_custkey, c_name FROM customer",
    "t8_redacted" ->
      (s"SELECT c_custkey, ${redactedSql("c_name")} AS c_name_red, " +
        s"${redactedSql("c_mktsegment", '#', 4)} AS c_seg_red FROM customer"),
    "t9_custom_plugin" ->
      "SELECT c_custkey, reverse(c_name) AS c_name FROM customer",
    "t10_random_date" ->
      s"SELECT o_orderkey, ${randomDateSql("o_orderkey")} AS o_fake_date FROM orders",
    "t_pipeline_bindings" ->
      (s"SELECT ${keepFirstDigitSql("c_custkey")} AS c_custkey, " +
        s"${emailSql("c_name")} AS c_name, " +
        s"${redactedSql("c_mktsegment")} AS c_mktsegment, " +
        "c_nationkey FROM customer")
  )
}
