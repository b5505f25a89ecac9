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
        children(1).eval().asInstanceOf[Number].intValue,
        children(2).eval().asInstanceOf[Number].intValue)))

    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineExpr].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineExpr(children.head, children(1))))

    ext.injectFunction((
      FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketExpr].getName, "graft_lsh_bucket"),
      (children: Seq[Expression]) => LshBucketExpr(
        children.head,
        children(1).eval().asInstanceOf[Number].intValue,
        children(2).eval().asInstanceOf[Number].intValue,
        children(3).eval().asInstanceOf[Number].longValue)))
  }
}
