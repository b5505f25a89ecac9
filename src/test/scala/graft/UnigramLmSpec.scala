package graft

import org.apache.spark.sql.functions._

import graft.ops.UnigramLm

/** Unigram-LM tokenizer trainer: EM/prune semantics on a hand-built
  * corpus where the right answers are checkable by eye.
  */
class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  private val cfg = UnigramLm.Config(maxWordLen = 6, maxPieceLen = 3,
    seedMulti = 40, pruneMulti = Seq(20, 10))

  test("dominant repeated substrings win vocabulary seats over singles") {
    // "ababab" repeated: the EM segmentation should converge on "ab"
    // (or "aba"/"bab"-family pieces) carrying most of the mass
    val df = Seq.fill(50)("ababab xy").toDF("text")
    val vocab = UnigramLm.train(df, $"text", cfg).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // singles always survive (add-one floor)
    for (c <- Seq("a", "b", "x", "y")) assert(vocab.contains(c), s"single '$c' pruned")
    val multis = vocab.keys.filter(_.length > 1)
    assert(multis.nonEmpty, "no multi-char piece survived")
    // the winning multi-char pieces must come from the dominant pattern
    val best = multis.maxBy(vocab)
    assert(Set("ab", "ba", "aba", "bab", "abab").exists(p => best == p),
      s"unexpected dominant piece '$best'")
    // and the dominant piece carries more EM mass than any single char
    assert(vocab(best) > vocab("x"), "repeated pattern should out-count rare singles")
  }

  test("every word is segmentable: unique-char words survive on singles alone") {
    val df = Seq("qwerty zzzzzz qwerty").toDF("text")
    val vocab = UnigramLm.train(df, $"text", cfg).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (c <- "qwertyz".map(_.toString)) assert(vocab.contains(c), s"single '$c' missing")
  }

  test("encode: multi-char pieces compress; over-long words char-fallback") {
    val df = Seq(
      (1L, "ababab ababab"),
      (2L, "qx"),
      (3L, "abcdefgh")  // 8 > maxWordLen 6 → char fallback
    ).toDF("doc_id", "text")
    val got = UnigramLm.encodeTokenCounts(df, "doc_id", $"text", cfg).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: two 6-char words; with "ab"-family pieces trained the
    // piece count must be well under the 12-char fallback
    assert(got(1L) < 12, s"doc 1 did not compress: ${got(1L)}")
    assert(got(1L) >= 2, "at least one piece per word")
    // "qx" seeds whole (every substring of every training word does)
    // and one 2-char piece beats two singles under any proper LM, so
    // the Viterbi segmentation is the single piece
    assert(got(2L) == 1, "whole-word piece should win over two singles")
    assert(got(3L) == 8, "over-long word falls back to one piece per char")
  }

  test("trainer restores the constraint-propagation conf it disables") {
    val key = "spark.sql.constraintPropagation.enabled"
    val before = spark.conf.getOption(key)
    UnigramLm.train(Seq("ab ab").toDF("text"), $"text", cfg).collect()
    assert(spark.conf.getOption(key) == before, "conf not restored")
  }

  test("deterministic: two runs produce the identical vocabulary") {
    val df = Tables.documents(spark, sfDir)
    val a = UnigramLm.train(df, $"text", cfg).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val b = UnigramLm.train(df, $"text", cfg).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b), "trainer output is not deterministic")
  }
}
