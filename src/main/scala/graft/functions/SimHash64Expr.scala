package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of whitespace-tokenized text — the codegen'd
  * form of `Dedup.simhash64Hof`.
  *
  * Semantics (bit-identical to the HOF formulation, asserted in
  * OpsSpec): tokens = `split(lower(trim(text)), "\\s+")`; per token the
  * xxhash64 (seed 42, Spark's default) votes +1/-1 on each of 64 bits;
  * a result bit is set when its vote total is positive.
  *
  * Why a custom `Expression`: the HOF version allocates an
  * intermediate 64-element vote array per token and evaluates
  * interpreted lambdas (`aggregate`/`zip_with` don't participate in
  * whole-stage codegen); this version is one static call inside the
  * generated code — single pass over tokens, one `long[64]` of votes
  * per row, no Catalyst array values at all.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  protected override def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.compute($c)")

  protected override def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {

  private val Seed = 42L // Spark's xxhash64 default seed
  private val Whitespace = UTF8String.fromString("\\s+")

  /** Static entry point shared by interpreted eval and generated code
    * (scalac emits a static forwarder on the companion class, so Janino
    * sees a plain static method).
    */
  def compute(text: UTF8String): Long = {
    val toks = text.trim.toLowerCase.split(Whitespace, -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}
