package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints — the codegen'd form of
  * `TextAnalysis.winnowFingerprintsHof` (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03).
  *
  * Semantics (value-identical to the HOF formulation, asserted in
  * OpsSpec, and to the DuckDB SQL mirror, hash-checked by the
  * `x_winnow_*` oracles): tokens = `split(lower(trim(text)), "\\s+")`;
  * per-token hash = first 8 md5 hex chars as a long (= the first 4
  * digest bytes, unsigned); gram hashes = the rolling polynomial
  * `fold(0, (acc, h) => (acc*B + h) % M)` over each window of `k`
  * token hashes; fingerprints = the min of each window of `w` gram
  * hashes (the gram list itself when shorter than `w`), distinct and
  * sorted. Fewer than `k` tokens → empty array.
  *
  * Why a custom `Expression`: the HOF version materializes the token
  * array, the hash array and the gram array as Catalyst array values
  * and re-slices them per window position through interpreted lambdas
  * (the slice alone is O(k) allocations per position); this is one
  * static call that walks primitive long arrays, recomputing nothing
  * but the O(k)/O(w) window folds it shares with the SQL mirror's
  * operation order.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0 && w > 0, "k and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow"

  protected override def nullSafeEval(input: Any): Any =
    WinnowExpr.compute(input.asInstanceOf[UTF8String], k, w)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WinnowExpr.compute($c, $k, $w);
      ${ev.isNull} = ${ev.value} == null;
    """)

  protected override def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object WinnowExpr {

  private val B = graft.ops.TextAnalysis.WinnowB
  private val M = graft.ops.TextAnalysis.WinnowM
  private val Whitespace = UTF8String.fromString("\\s+")

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = text.trim.toLowerCase.split(Whitespace, -1)
    if (toks.length < k) return new GenericArrayData(Array.emptyLongArray)
    // per-token hash: first 4 md5 digest bytes, unsigned (== the value
    // of the first 8 hex chars, what conv(substring(md5(t),1,8),16,10)
    // and the DuckDB mirror compute)
    val digest = md5.get()
    val hs = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      digest.reset()
      val d = digest.digest(toks(i).getBytes)
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    // rolling polynomial over each k-window (re-folded per position,
    // matching the HOF/SQL operation order exactly — the mod denies a
    // cheap incremental roll without a modular inverse)
    val nGrams = hs.length - k + 1
    val gs = new Array[Long](nGrams)
    i = 0
    while (i < nGrams) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * B + hs(i + j)) % M
        j += 1
      }
      gs(i) = acc
      i += 1
    }
    // windowed minima (the whole gram list when shorter than w),
    // distinct and sorted
    val mins = new java.util.TreeSet[java.lang.Long]()
    if (nGrams < w) {
      i = 0
      while (i < nGrams) { mins.add(gs(i)); i += 1 }
    } else {
      i = 0
      while (i <= nGrams - w) {
        var m = gs(i)
        var j = 1
        while (j < w) {
          if (gs(i + j) < m) m = gs(i + j)
          j += 1
        }
        mins.add(m)
        i += 1
      }
    }
    val out = new Array[Long](mins.size)
    val it = mins.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
