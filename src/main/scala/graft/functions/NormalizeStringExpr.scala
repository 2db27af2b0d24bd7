package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent-stripping, case-folding, whitespace-collapsing string
  * normalization as a native Catalyst expression.
  *
  * Semantics (mirrors the reference's `normalize_text`,
  * `/root/reference/Datos/preprocessing.py:11-22`): lowercase → Unicode
  * NFD decomposition → drop combining marks (category Mn) → collapse
  * whitespace runs to a single space → trim.
  *
  * Implemented as a codegen'd `UnaryExpression` (not a Scala UDF) so it
  * participates in whole-stage codegen: `doGenCode` emits a single static
  * call, keeping the hot path inside the generated `processNext()` loop
  * with no closure/serialization overhead. Equivalent to DuckDB's
  * `lower(strip_accents(..))` + regexp collapse for Latin text.
  */
case class NormalizeString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "normalize_string"

  override def nullSafeEval(input: Any): Any =
    NormalizeString.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeString.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeString =
    copy(child = newChild)
}

object NormalizeString {
  // (?U): Unicode-aware \s, matching the reference's Python `re` (which
  // treats NBSP/U+2028/etc. as whitespace); Java's default \s is
  // ASCII-only and would leave non-ASCII whitespace in join/group keys
  private val ws = java.util.regex.Pattern.compile("(?U)\\s+")

  /** Static entry point shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val lowered = s.toString.toLowerCase(java.util.Locale.ROOT)
    val decomposed =
      java.text.Normalizer.normalize(lowered, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val ch = decomposed.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    // strip(): Unicode-aware trim (String.trim is ASCII <= U+0020 only)
    UTF8String.fromString(ws.matcher(sb).replaceAll(" ").strip())
  }
}
