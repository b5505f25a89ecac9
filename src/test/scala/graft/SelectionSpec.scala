package graft

import org.apache.spark.sql.functions._

import graft.ops.Selection

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // A raw corpus with two sublanguages: "english-ish" docs sharing the
  // target's vocabulary and "noise" docs with a disjoint one.
  private lazy val raw = Seq(
    (1L, "the cat sat on the mat with the dog"),
    (2L, "the dog and the cat ran to the house"),
    (3L, "zqx wvu ponm lkj hgf dsa zqx wvu"),
    (4L, "qqq www eee rrr ttt yyy qqq www"),
    (5L, "the cat and the dog sat in the house"),
    (6L, "")).toDF("doc_id", "text")
  private lazy val target = Seq(
    (10L, "the cat sat with the dog in the house"),
    (11L, "the dog ran to the cat on the mat")).toDF("doc_id", "text")

  test("dsir weights rank target-like docs above disjoint-vocab docs; empty text is one ''-gram") {
    val lam = Selection.fitDsir(raw, target, $"text", buckets = 64)
    assert(lam.length == 64)
    val w = raw.select($"doc_id", Selection.dsirWeightQ($"text", lam).as("wq"))
      .as[(Long, Long)].collect().toMap
    // split("") -> [""] in Spark and DuckDB alike: the empty doc carries
    // exactly one unigram occurrence, so its weight is that bucket's lam
    val emptyBucket = spark.range(1)
      .select((graft.ops.TextAnalysis.md5PrefixLong(lit(""), 8) % 64).as("b"))
      .as[Long].head.toInt
    assert(w(6L) == lam(emptyBucket), "empty doc = single ''-gram occurrence")
    val targetLike = Seq(1L, 2L, 5L).map(w)
    val noise = Seq(3L, 4L).map(w)
    assert(targetLike.min > noise.max,
      s"every target-like doc should outweigh every noise doc: $w")
  }

  test("dsir fit is exact integer arithmetic: same lam across refits") {
    val a = Selection.fitDsir(raw, target, $"text", buckets = 64)
    val b = Selection.fitDsir(raw, target, $"text", buckets = 64)
    assert(a.sameElements(b))
  }

  test("dsirSelect takes the Gumbel top-k deterministically and favors the target slice") {
    val sel = Selection.dsirSelect(raw, target, $"doc_id", $"text", k = 3, buckets = 64)
      .select($"doc_id").as[Long].collect()
    val again = Selection.dsirSelect(raw, target, $"doc_id", $"text", k = 3, buckets = 64)
      .select($"doc_id").as[Long].collect()
    assert(sel.sameElements(again), "selection must be reproducible")
    // with 3 slots over {3 target-like, 2 noise, 1 empty}, the weight
    // gap (several nats per occurrence) dominates the Gumbel noise
    assert(sel.toSet == Set(1L, 2L, 5L), s"selected ${sel.toSeq}")
    // k larger than the corpus degrades to take-all
    assert(Selection.dsirSelect(raw, target, $"doc_id", $"text", k = 100, buckets = 64).count() == 6)
  }

  test("dsir scoring is narrow: the weighting plan has no shuffle") {
    val lam = Selection.fitDsir(raw, target, $"text", buckets = 64)
    val plan = Tables.documents(spark, sfDir)
      .select($"doc_id", Selection.dsirWeightQ($"text", lam).as("wq"))
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val exchanges = plan.collect { case s: ShuffleExchangeExec => s }
    assert(exchanges.isEmpty, s"scoring must not shuffle the corpus:\n$plan")
  }

  test("gumbelQ is a fixed deterministic perturbation in plausible range") {
    val g = spark.range(1000).select(Selection.gumbelQ($"id").as("g")).as[Long].collect()
    val g2 = spark.range(1000).select(Selection.gumbelQ($"id").as("g")).as[Long].collect()
    assert(g.sameElements(g2))
    // standard Gumbel: values concentrate in (-2, 10) nats (here millionths)
    assert(g.min > -3000000L && g.max < 25000000L)
    assert(g.distinct.length > 900, "md5-derived draws should rarely collide")
  }
}
