package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * Catalyst expressions so they resolve by name in SQL and via
  * `call_function` — enabled with
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def literal(fn: String, args: Seq[Expression], i: Int, what: String): Number = {
    if (args.length <= i)
      throw new IllegalArgumentException(
        s"$fn requires ${i + 1}+ arguments ($what missing)")
    val e = args(i)
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn argument ${i + 1} ($what) must be a literal, got: ${e.sql}")
    e.eval().asInstanceOf[Number]
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash64"),
      (children: Seq[Expression]) => SimHash64Expr(children.head)))

    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => MinHashSigExpr(
        children.head,
        literal("graft_minhash_sig", children, 1, "n").intValue,
        literal("graft_minhash_sig", children, 2, "numHashes").intValue)))

    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowExpr].getName, "graft_winnow"),
      (children: Seq[Expression]) => WinnowExpr(
        children.head,
        literal("graft_winnow", children, 1, "k").intValue,
        literal("graft_winnow", children, 2, "w").intValue)))

    ext.injectFunction((
      FunctionIdentifier("graft_deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatioExpr].getName, "graft_deflate_ratio"),
      (children: Seq[Expression]) => DeflateRatioExpr(children.head)))

    ext.injectFunction((
      FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContainsExpr].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => BloomContainsExpr(children.head, children(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(classOf[TokenCountExpr].getName, "graft_token_count"),
      (children: Seq[Expression]) => TokenCountExpr(children.head)))

    ext.injectFunction((
      FunctionIdentifier("graft_gopher_pass"),
      new ExpressionInfo(classOf[GopherPassExpr].getName, "graft_gopher_pass"),
      (children: Seq[Expression]) => GopherPassExpr(children.head)))

    ext.injectFunction((
      FunctionIdentifier("graft_lang_id"),
      new ExpressionInfo(classOf[LangIdExpr].getName, "graft_lang_id"),
      (children: Seq[Expression]) => LangIdExpr(children.head)))

    ext.injectFunction((
      FunctionIdentifier("graft_quality_score"),
      new ExpressionInfo(classOf[QualityScoreExpr].getName, "graft_quality_score"),
      (children: Seq[Expression]) => QualityScoreExpr(children.head)))

    ext.injectFunction((
      FunctionIdentifier("graft_scrub_pii"),
      new ExpressionInfo(classOf[ScrubPiiExpr].getName, "graft_scrub_pii"),
      (children: Seq[Expression]) => ScrubPiiExpr(children.head)))

    ext.injectFunction((
      FunctionIdentifier("graft_rep_ratio"),
      new ExpressionInfo(classOf[RepetitionRatioExpr].getName, "graft_rep_ratio"),
      (children: Seq[Expression]) => RepetitionRatioExpr(
        children.head,
        literal("graft_rep_ratio", children, 1, "n").intValue)))

    Seq(("graft_word_grams", 0), ("graft_word_grams_distinct", 1),
        ("graft_word_grams_sorted", 2)).foreach { case (fname, mode) =>
      ext.injectFunction((
        FunctionIdentifier(fname),
        new ExpressionInfo(classOf[WordGramsExpr].getName, fname),
        (children: Seq[Expression]) => WordGramsExpr(
          children.head, literal(fname, children, 1, "n").intValue, mode)))
    }

    ext.injectFunction((
      FunctionIdentifier("graft_md5_prefix"),
      new ExpressionInfo(classOf[Md5PrefixExpr].getName, "graft_md5_prefix"),
      (children: Seq[Expression]) => Md5PrefixExpr(
        children.head,
        literal("graft_md5_prefix", children, 1, "hexChars").intValue)))

    ext.injectFunction((
      FunctionIdentifier("graft_feature_buckets"),
      new ExpressionInfo(classOf[FeatureBucketsExpr].getName, "graft_feature_buckets"),
      (children: Seq[Expression]) => FeatureBucketsExpr(
        children.head,
        literal("graft_feature_buckets", children, 1, "buckets").intValue)))

    ext.injectFunction((
      FunctionIdentifier("graft_jaccard_sorted"),
      new ExpressionInfo(classOf[GramJaccardExpr].getName, "graft_jaccard_sorted"),
      (children: Seq[Expression]) => GramJaccardExpr(children.head, children(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineExpr].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineExpr(children.head, children(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketExpr].getName, "graft_lsh_bucket"),
      (children: Seq[Expression]) => LshBucketExpr(
        children.head,
        literal("graft_lsh_bucket", children, 1, "numPlanes").intValue,
        literal("graft_lsh_bucket", children, 2, "dim").intValue,
        literal("graft_lsh_bucket", children, 3, "seed").longValue)))
  }
}
