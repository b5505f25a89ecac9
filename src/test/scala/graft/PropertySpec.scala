package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ingest.{InsertParser, StatementSplitter}
import graft.model.StatementKind

/** ScalaCheck-generator properties — the SURVEY §5 recommendations:
  * splitter escaping roundtrip, re-synthesis roundtrip, transformer
  * invariants (length preservation, prefix law, first-digit sign).
  * Sampled with fixed seeds so runs are deterministic.
  */
class PropertySpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val p = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(p, Seed(i.toLong)))
  }

  // printable-ish strings with the characters that stress the quote
  // state machine: quotes, semicolons, newlines, comment dashes
  private val trickyString: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('\'', ';', '\n', '-', ' ', '(', ')', '"'),
      1 -> Gen.oneOf('ü', '€', '中'))).map(_.mkString)

  test("property: INSERT re-synthesis → split → parse is the identity") {
    samples(Gen.zip(trickyString, Gen.chooseNum(-1000000L, 1000000L)), 200)
      .foreach { case (s, n) =>
        val ins = InsertParser.Insert(
          "public", "t", Vector("a", "b"),
          Vector(InsertParser.SqlString(s), InsertParser.SqlLong(n)))
        val stmt = InsertParser.toQuery(ins)
        // the statement survives the splitter as ONE statement...
        val split = StatementSplitter.split(stmt + "\n")
        assert(split.count(_.kind == StatementKind.InsertInto) == 1,
          s"splitter broke statement for ${s.take(40)}")
        // ...and parses back to the same values
        val back = InsertParser.parse(
          split.find(_.kind == StatementKind.InsertInto).get.text).get
        assert(back.values(0) == InsertParser.SqlString(s))
        assert(back.values(1) == InsertParser.SqlLong(n))
      }
  }

  test("property: splitter never merges or drops statements") {
    val stmtGen = trickyString.map(s =>
      InsertParser.toQuery(InsertParser.Insert(
        "public", "t", Vector("a"), Vector(InsertParser.SqlString(s)))))
    samples(Gen.listOfN(5, stmtGen), 100).foreach { stmts =>
      val blob = stmts.mkString("\n")
      val split = StatementSplitter.split(blob)
      assert(split.count(_.kind == StatementKind.InsertInto) == stmts.length)
    }
  }

  test("property: T5 random preserves length, T8 redacted preserves prefix") {
    import graft.transform.Transformers
    val inputs = samples(trickyString, 80).filter(_.nonEmpty)
      // exclude newline-bearing values: this block tests transformer
      // laws on column values, not statement plumbing
      .map(_.replace('\n', ' '))
    val out = inputs.toDF("v").select(
      col("v"),
      Transformers.randomSameLen(col("v")).as("rnd"),
      Transformers.redacted(col("v")).as("red")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val v = r.getString(0); val rnd = r.getString(1); val red = r.getString(2)
      assert(rnd.length == v.length, s"T5 length changed for '$v'")
      if (v.length > 3) {
        assert(red == v.take(3) + "*" * 10, s"T8 shape wrong for '$v'")
      } else assert(red == v)
    }
  }

  test("property: keep-first-digit keeps sign and first digit") {
    import graft.transform.Transformers
    val ns = samples(Gen.chooseNum(-999999L, 999999L), 100)
    val out = ns.toDF("v")
      .select(col("v"), Transformers.keepFirstDigit(col("v")).as("k"))
      .as[(Long, Long)].collect()
    out.foreach { case (n, k) =>
      val expected =
        if (n == 0) 0L
        else {
          val d = math.abs(n).toString.head.asDigit.toLong
          if (n < 0) -d else d
        }
      assert(k == expected, s"keepFirstDigit($n) = $k, expected $expected")
    }
  }
}
