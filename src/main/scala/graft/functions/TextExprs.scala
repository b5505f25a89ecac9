package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native forms of the hot `TextAnalysis` per-row text metrics.
  *
  * Why custom `Expression`s (guide §4 "expressions and codegen"): the
  * Column formulations build on higher-order functions
  * (`filter`/`transform`/`aggregate`), which are CodegenFallback —
  * every document pays interpreted per-element lambda dispatch — and
  * each independent rule re-tokenizes the text through
  * `UTF8String.split`, which recompiles the `\s+` pattern on EVERY
  * call (`String.split` delegates to `Pattern.compile` for multi-char
  * regexes). A Gopher gate evaluated the split four times per row plus
  * one array-of-grams build with an O(G²)-flavored distinct. These
  * expressions decode the string once, tokenize with precompiled
  * patterns, and compute every rule in one pass.
  *
  * Semantics are value-identical to the HOF forms (parity-asserted in
  * TextExprsSpec over the test corpus plus adversarial strings, and
  * hash-checked against the DuckDB mirrors by the oracle queries):
  * every step reuses the exact building blocks the Column chain
  * bottoms out in — `UTF8String.trim`/`toLowerCase` for trim/lower,
  * Java-regex `split`/`find`/`replaceAll` with the same patterns, and
  * the same int/double operation order — so the produced values (and
  * their IEEE rounding) cannot diverge.
  */
private[graft] object TextNative {

  private val Ws: Pattern = Pattern.compile("\\s+")
  private val Nl: Pattern = Pattern.compile("\n")
  // `rlike("\\.\\.\\.\\s*$")` — keep the `$` semantics (end of input OR
  // before a final line terminator) by running the same pattern
  private val Ellipsis: Pattern = Pattern.compile("\\.\\.\\.\\s*$")

  import graft.ops.TextAnalysis.{stopwords, RequiredStopwords, RequiredStopwordMin}
  private val EnWords = stopwords("en").toSet
  private val DeWords = stopwords("de").toSet
  private val FrWords = stopwords("fr").toSet
  private val ReqWords = RequiredStopwords.toArray

  private val PiiCompiled: Array[(Pattern, String)] =
    graft.ops.TextAnalysis.PiiPatterns.map { case (p, r) => (Pattern.compile(p), r) }.toArray

  /** Java-regex `\s` class (the 6 ASCII members — no Unicode spaces). */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** `[.,;:!?"()\[\]{}_-]` — the TextAnalysis punctuation class. */
  @inline private def isPunct(c: Char): Boolean = c match {
    case '.' | ',' | ';' | ':' | '!' | '?' | '"' | '(' | ')' |
         '[' | ']' | '{' | '}' | '_' | '-' => true
    case _ => false
  }

  @inline private def isAsciiLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  /** `split(x, "\\s+")` with Spark's limit −1 (leading/trailing empty
    * pieces kept — `"a b\t"` splits to `["a","b",""]`).
    */
  @inline private def wsSplit(s: String): Array[String] = Ws.split(s, -1)

  /** `size(split(trim(text), "\\s+"))`. */
  def tokenCount(text: UTF8String): Int =
    wsSplit(text.trim.toString).length

  /** All eight Gopher rules in one pass — the value of
    * `gopherRules(text).map(_._2).reduce(_ && _)`.
    */
  def gopherPass(text: UTF8String): Boolean = {
    val s = text.toString
    val rawChars = text.numChars            // length(text)
    val decChars = s.codePointCount(0, s.length)
    val toks = wsSplit(text.trim.toString)
    val nTok = toks.length.toDouble

    // ok_word_count
    if (!(nTok >= 50.0 && nTok <= 100000.0)) return false

    // character tallies over the decoded string (the regexp_replace
    // operand): \s members and '#' are single-code-point BMP chars
    var wsChars = 0; var hashChars = 0
    var ci = 0
    while (ci < s.length) {
      val c = s.charAt(ci)
      if (isWs(c)) wsChars += 1
      else if (c == '#') hashChars += 1
      ci += 1
    }
    // ok_mean_word_len: length(regexp_replace(text, "\s", "")) / nTok
    val meanLen = (decChars - wsChars).toDouble / nTok
    if (!(meanLen >= 3.0 && meanLen <= 10.0)) return false

    // ok_alpha_ratio: tokens containing an ASCII letter
    var alpha = 0
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      var j = 0
      var hit = false
      while (j < t.length && !hit) { if (isAsciiLetter(t.charAt(j))) hit = true; j += 1 }
      if (hit) alpha += 1
      ti += 1
    }
    if (!(alpha.toDouble / nTok > 0.8)) return false

    // ok_symbol_ratio: (length(text) − length(regexp_replace(text, "#", ""))) / nTok
    val hashes = (rawChars - (decChars - hashChars)).toDouble
    if (!(hashes / nTok < 0.1)) return false

    // line rules over split(text, "\n")
    val lines = Nl.split(s, -1)
    val nLines = lines.length.toDouble
    var bullets = 0; var ellipses = 0
    val em = Ellipsis.matcher("")
    var li = 0
    while (li < lines.length) {
      val l = lines(li)
      // rlike("^\\s*[-*]"): optional \s run from the start, then - or *
      var k = 0
      while (k < l.length && isWs(l.charAt(k))) k += 1
      if (k < l.length && (l.charAt(k) == '-' || l.charAt(k) == '*')) bullets += 1
      em.reset(l)
      if (em.find()) ellipses += 1
      li += 1
    }
    if (!(bullets.toDouble / nLines < 0.9)) return false
    if (!(ellipses.toDouble / nLines < 0.3)) return false

    // ok_required_stopwords over distinct tokens of lower(text); the
    // lowered-TRIMMED split differs only in empty edge pieces, which are
    // never stopwords, so membership counts agree
    val lowToks = wsSplit(text.trim.toLowerCase.toString)
    val tokSet = new java.util.HashSet[String](math.max(16, lowToks.length * 2))
    ti = 0
    while (ti < lowToks.length) { tokSet.add(lowToks(ti)); ti += 1 }
    var required = 0
    var wi = 0
    while (wi < ReqWords.length) { if (tokSet.contains(ReqWords(wi))) required += 1; wi += 1 }
    if (required < RequiredStopwordMin) return false

    // ok_repetition: repetitionRatio(text, 2) < 0.2 over lower(trim(text)) tokens
    repRatio(lowToks, 2) < 0.2
  }

  /** `repetitionRatio(text, n)` — `(G − distinct G) / G` over the
    * `lower(trim(text))` word n-grams, 0.0 below `n` tokens.
    */
  def repetitionRatio(text: UTF8String, n: Int): Double =
    repRatio(wsSplit(text.trim.toLowerCase.toString), n)

  private def repRatio(toks: Array[String], n: Int): Double = {
    if (toks.length < n) return 0.0
    val g = toks.length - n + 1
    // distinct joined grams == distinct token windows (tokens carry no \s)
    val seen = new java.util.HashSet[String](math.max(16, g * 2))
    val sb = new java.lang.StringBuilder
    var i = 0
    var distinct = 0
    while (i < g) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (seen.add(sb.toString)) distinct += 1
      i += 1
    }
    (g - distinct).toDouble / g.toDouble
  }

  /** `langId(text)`: argmax of per-language stopword hits over
    * `split(lower(text), "\\s+")` (ties broken en → de → fr), "und"
    * when nothing scores. Empty edge tokens are never stopwords, so the
    * lowered-trimmed split is membership-identical.
    */
  /** Null text → "fr": the Column form's `when` chain sees every
    * condition as NULL and lands in `.otherwise(lit("fr"))`.
    */
  def langIdOrNull(text: UTF8String): UTF8String =
    if (text == null) Fr else langId(text)

  def langId(text: UTF8String): UTF8String = {
    val toks = wsSplit(text.trim.toLowerCase.toString)
    var en = 0; var de = 0; var fr = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.length >= 2 && t.length <= 5) {
        if (EnWords.contains(t)) en += 1
        if (DeWords.contains(t)) de += 1
        if (FrWords.contains(t)) fr += 1
      }
      i += 1
    }
    if (en == 0 && de == 0 && fr == 0) TextNative.Und
    else if (en >= de && en >= fr) TextNative.En
    else if (de >= fr) TextNative.De
    else TextNative.Fr
  }

  private val Und = UTF8String.fromString("und")
  private val En = UTF8String.fromString("en")
  private val De = UTF8String.fromString("de")
  private val Fr = UTF8String.fromString("fr")

  /** `qualityScore(text)` — same integer/double operation order as the
    * Column form: `lenOk*0.4 + stopwordRatio*0.4 + punctOk*0.2`.
    */
  def qualityScore(text: UTF8String): Double = {
    val s = text.toString
    val rawChars = text.numChars
    val decChars = s.codePointCount(0, s.length)
    val toks = wsSplit(text.trim.toString)
    val nTok = math.max(toks.length, 1).toDouble

    val avgTokLen = rawChars.toDouble / nTok
    val lenOk = if (avgTokLen >= 3.0 && avgTokLen <= 12.0) 1.0 else 0.0

    var punct = 0
    var ci = 0
    while (ci < s.length) { if (isPunct(s.charAt(ci))) punct += 1; ci += 1 }
    // punctCount = length(text) − length(regexp_replace(text, punct, ""))
    val punctCount = rawChars - (decChars - punct)
    val punctOk =
      if (punctCount.toDouble / math.max(rawChars, 1).toDouble < 0.2) 1.0 else 0.0

    // stopwordRatio: en hits over split(lower(text)) / greatest(tokenCount, 1)
    val lowToks = wsSplit(text.trim.toLowerCase.toString)
    var en = 0
    var i = 0
    while (i < lowToks.length) { if (EnWords.contains(lowToks(i))) en += 1; i += 1 }
    val sw = en.toDouble / nTok

    (lenOk * 0.4) + (sw * 0.4) + (punctOk * 0.2)
  }

  /** `scrubPii(text)`: the 5 PII patterns applied in order. One decode
    * and one encode instead of five round trips — each literal-tag
    * `replaceAll` matches RegExpReplace's append loop exactly.
    */
  def scrubPii(text: UTF8String): UTF8String = {
    var s = text.toString
    var i = 0
    while (i < PiiCompiled.length) {
      val (p, rep) = PiiCompiled(i)
      s = p.matcher(s).replaceAll(rep)
      i += 1
    }
    UTF8String.fromString(s)
  }
}

/** Shared scaffold: STRING → `out`, null-safe, static `compute` entry
  * point used by both interpreted eval and generated code.
  */
private[graft] abstract class TextNativeExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
  override def nullable: Boolean = true
  /** Fully-qualified static call, e.g. `graft.functions.TextNative.gopherPass`. */
  protected def staticCall: String
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $staticCall($c);")
}

case class TokenCountExpr(child: Expression) extends TextNativeExpr {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"
  protected def staticCall: String = "graft.functions.TextNative.tokenCount"
  protected override def nullSafeEval(input: Any): Any =
    TextNative.tokenCount(input.asInstanceOf[UTF8String])
  protected override def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
}

case class GopherPassExpr(child: Expression) extends TextNativeExpr {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_gopher_pass"
  protected def staticCall: String = "graft.functions.TextNative.gopherPass"
  protected override def nullSafeEval(input: Any): Any =
    TextNative.gopherPass(input.asInstanceOf[UTF8String])
  protected override def withNewChildInternal(newChild: Expression): GopherPassExpr =
    copy(child = newChild)
}

case class LangIdExpr(child: Expression) extends TextNativeExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"
  protected def staticCall: String = "graft.functions.TextNative.langIdOrNull"
  // the Column form ends in `.otherwise(lit("fr"))`, whose branch chain
  // swallows a NULL text into "fr" — never returns null; preserved
  // exactly (asserted on a null row in TextExprsSpec)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextNative.langIdOrNull(child.eval(input).asInstanceOf[UTF8String])
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val call = "graft.functions.TextNative.langIdOrNull"
    ev.copy(
      code = code"""
        ${c.code}
        UTF8String ${ev.value} = $call(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }
  protected override def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

case class QualityScoreExpr(child: Expression) extends TextNativeExpr {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_quality_score"
  protected def staticCall: String = "graft.functions.TextNative.qualityScore"
  protected override def nullSafeEval(input: Any): Any =
    TextNative.qualityScore(input.asInstanceOf[UTF8String])
  protected override def withNewChildInternal(newChild: Expression): QualityScoreExpr =
    copy(child = newChild)
}

case class ScrubPiiExpr(child: Expression) extends TextNativeExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_scrub_pii"
  protected def staticCall: String = "graft.functions.TextNative.scrubPii"
  protected override def nullSafeEval(input: Any): Any =
    TextNative.scrubPii(input.asInstanceOf[UTF8String])
  protected override def withNewChildInternal(newChild: Expression): ScrubPiiExpr =
    copy(child = newChild)
}

case class RepetitionRatioExpr(child: Expression, n: Int) extends TextNativeExpr {
  require(n > 0, "n must be positive")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_rep_ratio"
  protected def staticCall: String = ""  // unused — n needs threading
  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNative.repetitionRatio($c, $n);")
  protected override def nullSafeEval(input: Any): Any =
    TextNative.repetitionRatio(input.asInstanceOf[UTF8String], n)
  protected override def withNewChildInternal(newChild: Expression): RepetitionRatioExpr =
    copy(child = newChild)
}
