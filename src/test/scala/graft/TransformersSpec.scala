package graft

import org.apache.spark.sql.functions._

import graft.model.TransformerBinding
import graft.transform.Transformers

/** Invariant tests mirroring the reference's inline transformer tests
  * (e.g. `transformer/redacted.rs:121-135`, `keep_first_char.rs:100-115`).
  */
class TransformersSpec extends SparkSpec {
  import spark.implicits._

  private def one(in: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(in).toDF("v").select(f(col("v"))).as[String].head()

  test("email: produces @example.com address, preserves empty") {
    val out = one("John Doe", Transformers.email)
    assert(out.endsWith("@example.com"))
    assert(out != "John Doe")
    assert(one("", Transformers.email) == "")
    // deterministic
    assert(one("John Doe", Transformers.email) == out)
  }

  test("first-name: picks from the fixed list, deterministic") {
    val out = one("Katie Johnson", Transformers.firstName)
    assert(Transformers.firstNames.contains(out))
    assert(one("Katie Johnson", Transformers.firstName) == out)
    assert(one("", Transformers.firstName) == "")
  }

  test("phone-number: +1555 prefix, digits only, fixed length") {
    val out = one("206-555-0100", Transformers.phoneNumber)
    assert(out.matches("""\+1555\d{7}"""))
  }

  test("credit-card: 16 digits starting with 4") {
    val out = one("4242424242424242", Transformers.creditCard)
    assert(out.matches("""4\d{15}"""))
    assert(out != "4242424242424242")
  }

  test("random (string): same length, alphanumeric, differs from input") {
    for (in <- Seq("a", "hello world", "x" * 100)) {
      val out = one(in, Transformers.randomSameLen)
      assert(out.length == in.length, s"length mismatch for '$in'")
      assert(out.matches("[0-9a-f]+"))
    }
    assert(one("", Transformers.randomSameLen) == "")
  }

  test("keep-first-char: strings (reference keep_first_char.rs:66-85)") {
    assert(one("Lucas", Transformers.keepFirstChar) == "L")
    assert(one("L", Transformers.keepFirstChar) == "L")
    assert(one("", Transformers.keepFirstChar) == "")
  }

  test("keep-first-digit: sign preserved (reference get_first_digit loop)") {
    val df = Seq(123L, -123L, 5L, -5L, 0L).toDF("n")
    val out = df.select(Transformers.keepFirstDigit(col("n"))).as[Long].collect()
    assert(out.toSeq == Seq(1L, -1L, 5L, -5L, 0L))
  }

  test("redacted: first 3 chars + padding; short strings pass (redacted.rs:79-98)") {
    assert(one("FooBarBaz", c => Transformers.redacted(c)) == "Foo**********")
    assert(one("abc", c => Transformers.redacted(c)) == "abc")
    assert(one("abcd", c => Transformers.redacted(c, '#', 4)) == "abc####")
    // multi-byte safety (reference test uses chars().take(3))
    assert(one("日本語のテキスト", c => Transformers.redacted(c)) == "日本語**********")
  }

  test("transient: identity") {
    assert(one("unchanged", Transformers.transient) == "unchanged")
  }

  test("random-date: within [2000-01-01, +3650d), deterministic") {
    val df = Seq(1L, 2L, 3L).toDF("k")
    val out = df.select(Transformers.randomDate(col("k")).cast("string")).as[String].collect()
    out.foreach { d =>
      assert(d >= "2000-01-01" && d < "2010-01-01", s"date $d out of range")
    }
    val out2 = df.select(Transformers.randomDate(col("k")).cast("string")).as[String].collect()
    assert(out.toSeq == out2.toSeq)
  }

  test("t9: custom plugin transformer — involution (reference custom_wasm.rs:190-221)") {
    Transformers.registerCustom("reverse-string", c => reverse(c))
    val df = Seq("hello world", "", "ab").toDF("v")
    val twice = Transformers.applyBindings(
      Transformers.applyBindings(df, Seq(TransformerBinding("db", "t", "v", "reverse-string"))),
      Seq(TransformerBinding("db", "t", "v", "reverse-string")))
    assert(twice.except(df).count() == 0 && df.except(twice).count() == 0)
    assert(one("abc", Transformers.byId("reverse-string")) == "cba")
  }

  test("applyBindings: only bound columns change, type mismatch passes through") {
    val df = Tables.customer(spark, sfDir)
    val bound = Transformers.applyBindings(
      df,
      Seq(
        TransformerBinding("public", "customer", "c_name", "email"),
        // email on a numeric column: type mismatch → pass through
        TransformerBinding("public", "customer", "c_acctbal", "email")))
    assert(bound.schema == df.schema.copy()) // schema (names+order) preserved
    val joined = df.alias("a").join(bound.alias("b"), Seq("c_custkey"))
    assert(joined.filter($"a.c_name" === $"b.c_name").count() == 0)
    assert(joined.filter($"a.c_acctbal" =!= $"b.c_acctbal").count() == 0)
    assert(joined.filter($"a.c_mktsegment" =!= $"b.c_mktsegment").count() == 0)
  }
}
