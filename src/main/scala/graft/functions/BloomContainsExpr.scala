package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(bloomBytes, hash)` — membership test of a
  * 64-bit hash against a serialized `org.apache.spark.util.sketch`
  * Bloom filter. The map-side prefilter of
  * [[graft.ops.Dedup.contaminationHitsBloom]]: a Bloom of the
  * benchmark side's gram hashes thins the corpus-side gram stream
  * BEFORE its join exchange — no false negatives, so the exact
  * equi-join downstream confirms hits and the final answer is
  * unchanged; only shuffle volume shrinks.
  *
  * The filter bytes must be a LITERAL (they are baked into the plan
  * and deserialized ONCE per executor via a codegen reference object,
  * not per row). A plan-shipped filter is the right trade for the
  * size this is meant at — a 10M-gram eval suite at 1% fpp is ~12 MB;
  * far larger filters should move the benchmark side back into the
  * plain broadcast equi-join of [[graft.ops.Dedup.contaminationHits]].
  *
  * Same concept as Spark's internal runtime-filter
  * `BloomFilterMightContain` (not SQL-registered upstream), built on
  * the public sketch API so it resolves by name and stays inside
  * whole-stage codegen.
  */
case class BloomContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BINARY filter bytes, got ${left.dataType.catalogString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName filter bytes must be a literal (the plan ships them once)")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT hash, got ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  // deserialized once per JVM that evaluates the expression (driver
  // eval or executor codegen reference), never per row
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(left.eval().asInstanceOf[Array[Byte]]))

  protected override def nullSafeEval(bytes: Any, hash: Any): Any =
    bloom.mightContainLong(hash.asInstanceOf[Long])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the deserialized filter, not the bytes: the generated
    // code calls mightContainLong directly with zero per-row parsing
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    val r = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${r.code}
        boolean ${ev.isNull} = ${r.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.mightContainLong(${r.value});
        }""")
  }

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsExpr =
    copy(left = newLeft, right = newRight)
}
