package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a codegen'd Catalyst expression — the
  * prefix-weighted fuzzy-match scorer for entity resolution (name /
  * address dedup), complementing the edit-distance matcher
  * (`Similarity.closestMatch`, reference
  * `/root/reference/Datos/preprocessing.py:158-163`'s fuzzy
  * classification family).
  *
  * Semantics are pinned to the cross-engine contract the oracle
  * checks (DuckDB `jaro_winkler_similarity`), verified empirically:
  * the comparison runs over UTF-8 BYTES (no decode — `UTF8String`'s
  * native form, which also makes the hot loop allocation-free for
  * ASCII and non-ASCII alike), match window `max(len)/2 - 1`,
  * transpositions = FLOOR of half the out-of-order matches, Winkler prefix
  * bonus `min(4, prefix)·0.1·(1−jaro)` applied only when
  * `jaro > 0.7` (strict), and ANY empty input — including both empty
  * — scores 0.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two strings")
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler = copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static entry point shared by interpreted eval and codegen. */
  def similarity(a: UTF8String, b: UTF8String): Double =
    sim(a.getBytes, b.getBytes)

  private def sim(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk both matched sequences in order, count
    // positions whose matched bytes differ; halved per Jaro
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // DuckDB-parity detail: the transposition count is halved with
    // INTEGER division (floor), not the textbook t/2.0
    val jaro = (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
    if (jaro <= 0.7) return jaro
    // Winkler prefix bonus, capped at 4 bytes
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && s1(p) == s2(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}
