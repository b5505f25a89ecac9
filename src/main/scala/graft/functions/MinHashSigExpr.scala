package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature of a document's word n-gram set — the
  * codegen'd form of `Dedup.minhashSignatureHof`.
  *
  * Semantics (value-identical to the HOF formulation, asserted in
  * OpsSpec): tokens = `split(lower(trim(text)), "\\s+")`; grams = the
  * distinct space-joined n-token windows; the i-th hash family member
  * is the double-hashing combination `h1(g) XOR rotl(h2(g), i)` with
  * `h1 = xxhash64(g)` and `h2 = xxhash64(1L, g)` (XOR-rotate instead
  * of the additive Kirsch–Mitzenmacher form because ANSI SQL Long
  * arithmetic traps on wrap; each member is still a bijection of the
  * (h1, h2) pair), and element i of the signature is its min over
  * grams. Two real hash evaluations per gram simulate all `numHashes`
  * families — recall vs exact Jaccard is pinned in OpsSpec.
  * Documents with fewer than `n` tokens have no grams: the HOF version
  * yields an all-null signature, this one yields SQL NULL — both are
  * dropped by the caller's null filter before banding.
  *
  * Why a custom `Expression`: the HOF version re-walks the gram array
  * once per hash function through interpreted lambdas and allocates a
  * UTF8String array per walk; this is one static call with two hashes
  * and a tight add/compare loop per gram — no Catalyst array values,
  * no per-(i, gram) allocation.
  */
case class MinHashSigExpr(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  require(n > 0 && numHashes > 0, "n and numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[UTF8String], n, numHashes)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSigExpr.compute($c, $n, $numHashes);
      ${ev.isNull} = ${ev.value} == null;
    """)

  protected override def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {

  private val Seed = 42L // Spark's xxhash64 default seed
  private val Whitespace = UTF8String.fromString("\\s+")
  private val Space = UTF8String.fromString(" ")

  /** Static entry point shared by interpreted eval and generated code.
    * Returns null when the text has fewer than `n` tokens (no grams).
    */
  def compute(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val toks = text.trim.toLowerCase.split(Whitespace, -1)
    if (toks.length < n) return null
    // distinct n-gram byte strings (space-joined tokens, UTF-8 — the
    // same bytes concat_ws(" ", ...) produces)
    val grams = mutable.HashSet.empty[UTF8String]
    var i = 0
    while (i <= toks.length - n) {
      grams.add(UTF8String.concatWs(Space, toks.slice(i, i + n): _*))
      i += 1
    }
    // seed of SQL `xxhash64(1L, g)`: the long child hashes first, its
    // result seeds the gram-bytes hash
    val seed2 = XXH64.hashLong(1L, Seed)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    grams.foreach { g =>
      val h1 = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, Seed)
      val h2 = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, seed2)
      var k = 0
      while (k < numHashes) {
        val v = h1 ^ java.lang.Long.rotateLeft(h2, k)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
    }
    new GenericArrayData(sig)
  }
}
