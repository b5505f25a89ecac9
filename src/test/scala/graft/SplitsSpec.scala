package graft

import org.apache.spark.sql.functions._

import graft.ops.{Sampling, Splits, TextAnalysis => TA}

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("splitAssign is deterministic, total, and near the target fractions") {
    val assigned = Splits.splitAssign(docs, $"doc_id")
    val byn = assigned.groupBy($"split").count().as[(String, Long)].collect().toMap
    val total = byn.values.sum
    assert(total == docs.count())
    assert(byn.keySet.subsetOf(Set("train", "val", "test")))
    // md5 buckets: each split within a loose tolerance of its target
    assert(byn("train").toDouble / total > 0.8 && byn("train").toDouble / total < 0.97)
    // stable across evaluations (pure hash, no RNG)
    val again = Splits.splitAssign(docs, $"doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val first = assigned.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(first == again)
  }

  test("splitAssign keyed by content fingerprint co-locates exact duplicates") {
    val df = Seq(
      (1L, "same text here"), (2L, "same  TEXT here "), (3L, "different entirely"))
      .toDF("doc_id", "text")
    val m = Splits.splitAssign(df, TA.fingerprint($"text"))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(m(1L) == m(2L))
  }

  test("splitAssign rejects fractions that do not sum to one") {
    intercept[IllegalArgumentException] {
      Splits.splitAssign(docs, $"doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("crossSplitPairs keeps only pairs straddling a boundary") {
    val assign = Seq((1L, "train"), (2L, "val"), (3L, "train"), (4L, "test"))
      .toDF("doc_id", "split")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("id_a", "id_b")
    val crossed = Splits.crossSplitPairs(pairs, assign, "doc_id")
      .select($"id_a", $"id_b", $"split_a", $"split_b")
      .as[(Long, Long, String, String)].collect().toSet
    assert(crossed == Set((1L, 2L, "train", "val"), (2L, 4L, "val", "test")))
  }

  test("quarantine evicts the lower-priority side, never train, deterministically") {
    val assign = Seq((1L, "train"), (2L, "val"), (3L, "test"), (4L, "train"))
      .toDF("doc_id", "split")
    // 2 leaks against BOTH train docs → one row, leak_of = min(1, 4)
    val pairs = Seq((1L, 2L), (2L, 4L), (2L, 3L)).toDF("id_a", "id_b")
    val q = Splits.quarantine(pairs, assign, "doc_id")
      .as[(Long, String, Long)].collect().toSet
    // (2,3) is val-vs-test: test side (3) evicted, evidence is 2
    assert(q == Set((2L, "val", 1L), (3L, "test", 2L)))
    assert(!q.exists(_._2 == "train"))
  }

  test("capPerGroup caps every group at ceil(share * total) with under-cap groups intact") {
    val df = (1L to 100L).map(i => (i, if (i <= 80) "big" else s"s${i % 4}"))
      .toDF("doc_id", "source")
    val capped = Sampling.capPerGroup(df, $"source", $"doc_id", 0.10)
    val byn = capped.groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(byn("big") == 10) // ceil(0.10 * 100)
    // small groups (≤5 rows each) untouched
    (0 to 3).foreach { k =>
      assert(byn(s"s$k") == df.filter($"source" === s"s$k").count())
    }
    // deterministic: the kept subset is identical on re-evaluation
    val a = capped.select($"doc_id").as[Long].collect().toSet
    val b = Sampling.capPerGroup(df, $"source", $"doc_id", 0.10)
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b)
    // schema untouched: no helper columns leak
    assert(capped.columns.toSeq == df.columns.toSeq)
  }

  test("normalizeUrl applies every rule; non-URLs pass through") {
    val cases = Seq(
      // case + www + default port + fragment
      "HTTPS://WWW.Ex.COM:443/A/b#frag" -> "https://ex.com/A/b",
      "http://ex.com:80/x" -> "http://ex.com/x",
      // non-default port survives
      "http://ex.com:8080/x" -> "http://ex.com:8080/x",
      // tracking params: leading, middle, trailing, solitary
      "https://ex.com/p?utm_source=a&id=1" -> "https://ex.com/p?id=1",
      "https://ex.com/p?id=1&utm_campaign=a&q=2" -> "https://ex.com/p?id=1&q=2",
      "https://ex.com/p?id=1&fbclid=zz" -> "https://ex.com/p?id=1",
      "https://ex.com/p?gclid=zz" -> "https://ex.com/p",
      // trailing slash (only once), emptied query
      "https://ex.com/dir/" -> "https://ex.com/dir",
      "https://ex.com/" -> "https://ex.com",
      // not a URL
      "  just words  " -> "just words")
    val out = cases.map(_._1).toDF("url")
      .select(TA.normalizeUrl($"url")).as[String].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(got == want, s"normalizeUrl mismatch: got '$got', want '$want'")
    }
  }
}
