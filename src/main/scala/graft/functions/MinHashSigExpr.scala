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
  * distinct space-joined n-token windows; element i of the signature is
  * `min over grams of xxhash64(i, gram)` with Spark's two-argument hash
  * fold (`hashInt(i, seed=42)` seeding the gram-bytes hash). Documents
  * with fewer than `n` tokens have no grams: the HOF version yields an
  * all-null signature, this one yields SQL NULL — both are dropped by
  * the caller's null filter before banding.
  *
  * Why a custom `Expression`: the HOF version re-walks the gram array
  * once per hash function through interpreted lambdas and allocates a
  * UTF8String array per walk; this is one static call that hashes each
  * gram's bytes 64 times in a tight loop — no Catalyst array values,
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
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    grams.foreach { g =>
      var k = 0
      while (k < numHashes) {
        // Spark's xxhash64(k, gram): the int child hashes first, its
        // result seeds the gram-bytes hash
        val h = XXH64.hashUnsafeBytes(
          g.getBaseObject, g.getBaseOffset, g.numBytes, XXH64.hashInt(k, Seed))
        if (h < sig(k)) sig(k) = h
        k += 1
      }
    }
    new GenericArrayData(sig)
  }
}
