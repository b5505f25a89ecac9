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
  * in whole-stage codegen. The `Deflater` (a native zlib handle) is
  * thread-local and `reset()` between rows: expression evaluation is
  * single-threaded per task, so reuse is safe and avoids per-row JNI
  * construct/teardown churn on a corpus-scale scan.
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
  // one native zlib stream per task thread, reset() per row — never
  // end()'d, but a Deflater holds only a small native buffer and the
  // executor's task threads are a bounded pool, so the finalizer-free
  // steady state is a fixed handful of streams per JVM
  private val localDeflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
  }

  /** deflate(text, level 6) length / raw length; 1.0 for empty input. */
  def compute(text: UTF8String): Double = {
    val raw = text.getBytes
    if (raw.isEmpty) return 1.0
    val d = localDeflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / raw.length.toDouble
  }
}
