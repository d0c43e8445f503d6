package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the engine's most ubiquitous scalar — reference text
  * normalization (lower-case, any non-alphanumeric run → single space,
  * trim) and its tokenization — which sit under every blocking, scoring,
  * LM and feature path.
  *
  * The composed form (`trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))`
  * + `array_remove(split(_, " "), "")`) runs a JVM regex with per-row
  * matcher state twice per document (replace + split) and materializes
  * the intermediate normalized string even when only tokens are consumed.
  * These kernels do one byte walk over the lower-cased UTF-8 bytes.
  *
  * BYTE-LEVEL EQUIVALENCE to the regex (the parity FunctionsSpec pins):
  * after lower-casing, a character matches [a-z0-9] iff it is a single
  * UTF-8 byte in those ranges; every other character consists entirely of
  * bytes outside them (other ASCII by value; multi-byte sequences because
  * lead bytes are ≥ 0xC2 and continuation bytes ≥ 0x80) — so a maximal
  * run of non-matching CHARACTERS is exactly a maximal run of
  * non-matching BYTES, and replacing byte runs preserves the regex's
  * semantics including surrogate pairs. Lower-casing calls the same
  * `UTF8String.toLowerCase` Spark's `lower` uses, so locale/Unicode
  * behavior is identical by construction.
  */
object TextKernels {

  @inline private def alnum(c: Byte): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** ≡ trim(regexp_replace(lower(s), "[^a-z0-9]+", " ")) */
  def normText(s: UTF8String): UTF8String = {
    val b = s.toLowerCase.getBytes
    val out = new Array[Byte](b.length)
    var n = 0
    var needSpace = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (alnum(c)) {
        if (needSpace) { out(n) = ' '; n += 1; needSpace = false }
        out(n) = c
        n += 1
      } else if (n > 0) needSpace = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }

  /** ≡ array_remove(split(normText(s), " "), "") — the alnum segments. */
  def normTokens(s: UTF8String): GenericArrayData = {
    val b = s.toLowerCase.getBytes
    val segs = new java.util.ArrayList[UTF8String]()
    var start = -1
    var i = 0
    while (i < b.length) {
      if (alnum(b(i))) { if (start < 0) start = i }
      else if (start >= 0) {
        segs.add(UTF8String.fromBytes(b, start, i - start))
        start = -1
      }
      i += 1
    }
    if (start >= 0) segs.add(UTF8String.fromBytes(b, start, b.length - start))
    new GenericArrayData(segs.toArray)
  }

  /** ≡ length(regexp_replace(s, "[^A-Za-z0-9 ]", "")) — the count of
    * code points in [A-Za-z0-9 ]. Every matching character is a single
    * ASCII byte and no multi-byte character contains bytes in those
    * ranges, so a byte scan counts exactly the regex's survivors.
    */
  def asciiAlnumSpaceCount(s: UTF8String): Int = {
    val b = s.getBytes
    var n = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == ' ') n += 1
      i += 1
    }
    n
  }

  /** ≡ size(regexp_extract_all(lower(s), "[a-z]+|[0-9]|[^a-z0-9\s]", 0)):
    * a run of [a-z] counts 1, each digit counts 1, each other
    * non-whitespace CODE POINT counts 1 (Java regex character classes
    * match whole code points, so a 4-byte emoji is one match),
    * whitespace = the regex \s set [ \t\n\x0B\f\r] — pure ASCII, so
    * multi-byte characters can never be whitespace here. One byte walk
    * over the lower-cased bytes; lead bytes (not 0b10xxxxxx) delimit
    * code points.
    */
  def bpeCount(s: UTF8String): Int = {
    val b = s.toLowerCase.getBytes
    var n = 0
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c >= 'a' && c <= 'z') {
        n += 1
        i += 1
        while (i < b.length && b(i) >= 'a' && b(i) <= 'z') i += 1
      } else if (c >= '0' && c <= '9') { n += 1; i += 1 }
      else if (c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' ||
               c == '\r') i += 1
      else if (c >= 0) { n += 1; i += 1 } // other ASCII punctuation
      else {
        // multi-byte code point: one match, skip its continuation bytes
        n += 1
        i += 1
        while (i < b.length && (b(i) & 0xC0) == 0x80) i += 1
      }
    }
    n
  }
}

/** Codegen'd `norm_text` (same pattern as the other graft expressions:
  * generated code calls the static kernel, whole-stage codegen intact).
  */
case class AsciiAlnumSpaceCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ascii_alnum_space_count requires string, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ascii_alnum_space_count"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.asciiAlnumSpaceCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.asciiAlnumSpaceCount($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd BPE-ish subword counter ≡
  * `size(regexp_extract_all(lower(s), "[a-z]+|[0-9]|[^a-z0-9\\s]", 0))`.
  */
case class BpeCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_count requires string, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_count"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.bpeCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.bpeCount($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class NormTextExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"norm_text requires string, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "norm_text"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.normText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.normText($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd tokenizer: norm_text fused with the whitespace split, never
  * materializing the normalized string.
  */
case class NormTokensExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tokens requires string, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "norm_tokens"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.normTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.normTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
