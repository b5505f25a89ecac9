package graft.functions

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native forms of the cross-engine md5-prefix hash discipline.
  *
  * The portable-hash idiom is `conv(substring(md5(x), 1, hexChars), 16,
  * 10) :: long` — every oracle-checked hash path (per-mille sampling,
  * DSIR buckets, gram hashes, split assignment, the md5 simhash) routes
  * through it for DuckDB parity. The md5 digest itself is the price of
  * that parity and stays; what goes is the detour through a 32-char hex
  * STRING (encode, substring, string-to-long parse): the first
  * `hexChars` hex digits ARE the top `4*hexChars` bits of the digest,
  * assembled here directly from the digest bytes (WinnowExpr has done
  * exactly this for its 8-hex token hashes since r17; this generalizes
  * it to every call site, VERDICT r20 #3). Values are bit-identical —
  * parity-asserted in TextExprsSpec and re-gated by every hashing
  * oracle query.
  */
private[graft] object HashNative {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First `hexChars` md5 hex digits of the string's UTF-8 bytes, as an
    * unsigned long (hexChars ≤ 15 keeps it inside the signed range).
    */
  def md5Prefix(text: UTF8String, hexChars: Int): Long = {
    val digest = md5.get()
    digest.reset()
    prefixOf(digest.digest(text.getBytes), hexChars)
  }

  @inline private def prefixOf(d: Array[Byte], hexChars: Int): Long = {
    var v = 0L
    var i = 0
    while (i < hexChars) {
      val b = d(i >> 1) & 0xff
      val nibble = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }

  private val Ws: Pattern = Pattern.compile("\\s+")

  /** DSIR hashed feature buckets: every unigram, then every bigram, of
    * `split(lower(trim(text)), "\s+")`, each mapped to
    * `md5Prefix(gram, 8) % buckets` — the value order and arithmetic of
    * `concat(wordNgrams(text,1), wordNgrams(text,2))` mapped through
    * the md5-prefix idiom (a bag, not a set: counts matter).
    */
  def featureBuckets(text: UTF8String, buckets: Int): ArrayData = {
    val toks = Ws.split(text.trim.toLowerCase.toString, -1)
    val digest = md5.get()
    val n = toks.length
    val nBi = if (n >= 2) n - 1 else 0
    val out = new Array[Long](n + nBi)
    var i = 0
    while (i < n) {
      digest.reset()
      out(i) = prefixOf(digest.digest(
        UTF8String.fromString(toks(i)).getBytes), 8) % buckets
      i += 1
    }
    var j = 0
    while (j < nBi) {
      digest.reset()
      out(n + j) = prefixOf(digest.digest(
        UTF8String.fromString(toks(j) + " " + toks(j + 1)).getBytes), 8) % buckets
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class Md5PrefixExpr(child: Expression, hexChars: Int) extends UnaryExpression {
  require(hexChars > 0 && hexChars <= 15, "hexChars must be in [1, 15]")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_md5_prefix"
  protected override def nullSafeEval(input: Any): Any =
    HashNative.md5Prefix(input.asInstanceOf[UTF8String], hexChars)
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashNative.md5Prefix($c, $hexChars);")
  protected override def withNewChildInternal(newChild: Expression): Md5PrefixExpr =
    copy(child = newChild)
}

case class FeatureBucketsExpr(child: Expression, buckets: Int) extends UnaryExpression {
  require(buckets > 0, "buckets must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_feature_buckets"
  protected override def nullSafeEval(input: Any): Any =
    HashNative.featureBuckets(input.asInstanceOf[UTF8String], buckets)
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashNative.featureBuckets($c, $buckets);")
  protected override def withNewChildInternal(newChild: Expression): FeatureBucketsExpr =
    copy(child = newChild)
}
