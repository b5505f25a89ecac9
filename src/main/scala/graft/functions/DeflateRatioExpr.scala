package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: `deflated bytes / raw bytes` of
  * the UTF-8 text (zlib level 6). The published compressibility tagger
  * (Dolma's "compression ratio", and the repetition intuition behind
  * Gopher's dup rules): boilerplate and templated spam compress far
  * below prose, so a low ratio flags low-entropy text that n-gram
  * counts can miss (long-range repeats). Empty text → 1.0.
  *
  * A native `Expression` because there is no built-in deflate and a
  * Scala UDF would pay serialization per row; codegen emits one static
  * call (same shape as [[WinnowExpr]]), so the expression participates
  * in whole-stage codegen. One `Deflater` is allocated per call —
  * correctness first; a per-task reuse needs thread-local state the
  * static-call contract can't carry safely across codegen'd operators.
  *
  * No DuckDB oracle by nature (no zlib there); OpsSpec pins exact
  * parity with a driver-side reference deflate and the monotone
  * repetitive-vs-diverse ordering.
  */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_deflate_ratio"

  protected override def nullSafeEval(input: Any): Any =
    DeflateRatioExpr.compute(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateRatioExpr.compute($c)")

  protected override def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}

object DeflateRatioExpr {
  /** deflate(text, level 6) length / raw length; 1.0 for empty input. */
  def compute(text: UTF8String): Double = {
    val raw = text.getBytes
    if (raw.isEmpty) return 1.0
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length.toDouble
    } finally d.end()
  }
}
