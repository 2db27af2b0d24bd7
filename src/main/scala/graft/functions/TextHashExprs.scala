package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-sketching hot path.
  *
  * Spark's higher-order array functions (`transform`/`aggregate`) do not
  * participate in whole-stage codegen and re-evaluate lambda subtrees
  * per element — a k=32 MinHash signature composed from them costs
  * ~20 ms/row interpreted. These expressions do the same work in one
  * tight Java pass per row (tokenize → shingle → hash → fold), exposed
  * through `doGenCode` as a single static call so the surrounding
  * operators stay inside WholeStageCodegen.
  *
  * Hashing: xxh64-style 64-bit avalanche over token/shingle bytes; the
  * k signature views use the standard two-hash construction
  * h_i = h1 + i·h2 (Kirsch–Mitzenmacher), so cost is O(shingles + k)
  * per row, not O(shingles·k).
  */
object TextHash {

  /** 64-bit avalanche finalizer (splitmix64). */
  @inline private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 64-bit hash of a string region with a seed (FNV-1a 64 over UTF-8
    * bytes, then avalanched — deterministic, allocation-free). */
  def hash64(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = 0xCBF29CE484222325L ^ mix64(seed)
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001B3L
      i += 1
    }
    mix64(h)
  }

  /** The RE2 `\s` class — ` \t\n\f\r`, FIVE chars — NOT Java's `\s`
    * (which adds U+000B vertical tab) and NOT
    * `Character.isWhitespace` (which adds a dozen Unicode points).
    * Every token-boundary producer that can feed the same join must
    * agree on ONE class, and the DuckDB oracles' RE2 `\s+` is the
    * narrowest of the three — so it is the reference: the string side
    * ([[graft.text.TextOps.tokens]]) splits on an explicit
    * `[ \t\n\f\r]+`, and this native side matches it. A char in the
    * wider classes but not RE2's (U+000B; or under `isWhitespace`
    * also U+2028, U+1680, U+2000–200A, U+3000, U+001C–001F) would
    * silently desynchronize the hash screen from the exact verify —
    * a contaminated doc could pass [[gramHashes]]' screen unseen and
    * never reach the string verify (a false negative the exactness
    * contract forbids). */
  @inline private def isTokenSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Whitespace tokens of `text` (runs of non-`\s`; see
    * [[isTokenSep]] for why the class is the ASCII regex `\s`, not
    * `Character.isWhitespace`). */
  def tokenize(text: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && isTokenSep(text.charAt(i))) i += 1
      val start = i
      while (i < n && !isTokenSep(text.charAt(i))) i += 1
      if (i > start) out.add(text.substring(start, i))
    }
    out
  }

  /** Distinct w-word shingles; <w tokens → the single joined-token
    * shingle (matches [[graft.text.TextOps.wordShingles]]). */
  def shingleSet(text: UTF8String, w: Int): java.util.LinkedHashSet[String] = {
    val toks = tokenize(text.toString)
    val out = new java.util.LinkedHashSet[String]()
    if (toks.size < w) {
      out.add(String.join(" ", toks))
    } else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + w <= toks.size) {
        sb.setLength(0)
        var j = 0
        while (j < w) {
          if (j > 0) sb.append(' ')
          sb.append(toks.get(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    out
  }

  /** Sorted distinct shingle array (UTF8String), for exact-Jaccard
    * verification via array_intersect. */
  def shingleArray(text: UTF8String, w: Int): ArrayData = {
    val set = shingleSet(text, w)
    val arr = new Array[AnyRef](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]],
      new java.util.Comparator[AnyRef] {
        def compare(a: AnyRef, b: AnyRef): Int =
          a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
      })
    new GenericArrayData(arr)
  }

  /** k-view MinHash signature of the shingle set. */
  def minhashSig(text: UTF8String, w: Int, k: Int): Array[Long] = {
    val set = shingleSet(text, w)
    val mins = Array.fill(k)(Long.MaxValue)
    val it = set.iterator()
    while (it.hasNext) {
      val s = UTF8String.fromString(it.next())
      val h1 = hash64(s, 0x51_7C_C1_B7L)
      val h2 = hash64(s, 0x27_22_0A_95L) | 1L
      var i = 0
      var hi = h1
      while (i < k) {
        if (hi < mins(i)) mins(i) = hi
        hi += h2
        i += 1
      }
    }
    mins
  }

  def minhashSigData(text: UTF8String, w: Int, k: Int): ArrayData =
    new GenericArrayData(minhashSig(text, w, k))

  /** LSH band buckets: hash of each r-slice of the signature, salted by
    * the band index. */
  def minhashBands(text: UTF8String, w: Int, bands: Int, r: Int): ArrayData = {
    val sig = minhashSig(text, w, bands * r)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = mix64(b.toLong + 0x9E3779B97F4A7C15L)
      var j = 0
      while (j < r) {
        h = mix64(h ^ sig(b * r + j))
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  private val GramSeed = 0x6A09E667F3BCC908L

  /** Distinct 64-bit hashes of the w-word shingles WITHOUT
    * materializing gram strings: [[hash64]]'s FNV-1a fold streamed
    * token-by-token with a single 0x20 between tokens — byte-identical
    * to `hash64(joined gram, GramSeed)`, so any two producers meet on
    * equal grams exactly. <w tokens → the single whole-join gram
    * ([[shingleSet]] semantics, empty text included). Each token's
    * UTF-8 bytes are materialized once and reused across the w windows
    * containing it; no per-gram string, no set of strings — this is
    * the corpus-side screen for n-gram containment joins
    * ([[graft.text.Decontaminate]]), where building ~25-byte gram
    * strings for every corpus position is the measured cost. */
  def gramHashes(text: UTF8String, w: Int): ArrayData = {
    val toks = tokenize(text.toString)
    val n = toks.size
    val tokBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tokBytes(i) = toks.get(i).getBytes(
        java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val seeded = 0xCBF29CE484222325L ^ mix64(GramSeed)
    @inline def foldBytes(h0: Long, bytes: Array[Byte]): Long = {
      var h = h0
      var j = 0
      while (j < bytes.length) {
        h = (h ^ (bytes(j) & 0xffL)) * 0x100000001B3L
        j += 1
      }
      h
    }
    def hashWindow(start: Int, len: Int): Long = {
      var h = seeded
      var j = 0
      while (j < len) {
        if (j > 0) h = (h ^ 0x20L) * 0x100000001B3L
        h = foldBytes(h, tokBytes(start + j))
        j += 1
      }
      mix64(h)
    }
    if (n < w) new GenericArrayData(Array(hashWindow(0, n)))
    else {
      val set = new java.util.LinkedHashSet[java.lang.Long]()
      var s = 0
      while (s + w <= n) {
        set.add(java.lang.Long.valueOf(hashWindow(s, w)))
        s += 1
      }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
      new GenericArrayData(out)
    }
  }

  /** [[hash64]] with [[gramHashes]]' seed — the string-side twin for
    * producers that HAVE the gram string (equality holds by the
    * byte-identity above). */
  def gramHash64(s: UTF8String): Long = hash64(s, GramSeed)

  /** 64-bit SimHash over lowercase ascii word tokens ([a-z0-9]+ runs). */
  def simhash64(text: UTF8String): Long = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val votes = new Array[Int](64)
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      val start = i
      while (i < n && isWordChar(s.charAt(i))) i += 1
      if (i > start) {
        val h = hash64(UTF8String.fromString(s.substring(start, i)), 0x5133_D00DL)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) != 0L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** Engine-portable polynomial rolling hash over lowercase ascii word
    * tokens — exactly `fold(h*31 + (17*len(w) + codepoint(w[0]))) mod
    * 1e9+7`, the same arithmetic a SQL oracle can express. */
  def rollingHash(text: UTF8String): Long = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var h = 0L
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && !isWordChar(s.charAt(i))) i += 1
      val start = i
      while (i < n && isWordChar(s.charAt(i))) i += 1
      if (i > start) {
        val x = 17L * (i - start) + s.charAt(start).toLong
        h = (h * 31L + x) % 1000000007L
      }
    }
    h
  }

  /** Two-pointer intersection count over binary-sorted string arrays
    * (see [[SortedIntersectCountExpr]]). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Same kernel over sorted `array<int>` (hash-compressed sets). */
  def sortedIntersectCountInt(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getInt(i); val y = b.getInt(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

}

/** Base for one-string-in native expressions. Declares its input type
  * so a mistyped SQL call (`simhash64(42)`) fails at analysis with an
  * AnalysisException instead of a mid-execution ClassCastException. */
abstract class TextHashExpr extends UnaryExpression {
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got " +
          child.dataType.simpleString)
  override def nullIntolerant: Boolean = true
  protected def staticCall(c: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, staticCall)
}

/** `array<long>` MinHash signature. */
case class MinHashSigExpr(child: Expression, width: Int, k: Int)
    extends TextHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    TextHash.minhashSigData(input.asInstanceOf[UTF8String], width, k)
  protected def staticCall(c: String): String =
    s"graft.functions.TextHash.minhashSigData($c, $width, $k)"
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** `array<long>` LSH band buckets. */
case class MinHashBandsExpr(child: Expression, width: Int, bands: Int, r: Int)
    extends TextHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"
  override def nullSafeEval(input: Any): Any =
    TextHash.minhashBands(input.asInstanceOf[UTF8String], width, bands, r)
  protected def staticCall(c: String): String =
    s"graft.functions.TextHash.minhashBands($c, $width, $bands, $r)"
  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

/** Sorted distinct `array<string>` word shingles. */
case class ShingleSetExpr(child: Expression, width: Int) extends TextHashExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"
  override def nullSafeEval(input: Any): Any =
    TextHash.shingleArray(input.asInstanceOf[UTF8String], width)
  protected def staticCall(c: String): String =
    s"graft.functions.TextHash.shingleArray($c, $width)"
  override protected def withNewChildInternal(newChild: Expression): ShingleSetExpr =
    copy(child = newChild)
}

/** Distinct `array<long>` gram hashes (no gram-string
  * materialization — see [[TextHash.gramHashes]]). */
case class GramHashesExpr(child: Expression, width: Int) extends TextHashExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"
  override def nullSafeEval(input: Any): Any =
    TextHash.gramHashes(input.asInstanceOf[UTF8String], width)
  protected def staticCall(c: String): String =
    s"graft.functions.TextHash.gramHashes($c, $width)"
  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
}

/** 64-bit SimHash. */
case class SimHashExpr(child: Expression) extends TextHashExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    TextHash.simhash64(input.asInstanceOf[UTF8String])
  protected def staticCall(c: String): String =
    s"graft.functions.TextHash.simhash64($c)"
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Intersection COUNT of two binary-sorted `array<string>` — the
  * verification kernel of the containment join. `array_intersect`
  * builds a hash set per row (allocation + string hashing per
  * element, non-codegen'd higher-order eval); for arrays that are
  * already sorted by `UTF8String` binary order (what `shingle_set`
  * and `sort_array` both emit) a two-pointer merge does the same
  * count with zero allocation — measured ~10× on the q154 probe's
  * 61M-pair verification stage. Both inputs MUST be sorted ascending
  * (binary order); the caller owns that invariant. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override def nullIntolerant: Boolean = true
  private def isIntKernel: Boolean = left.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elem(t: DataType) = t match {
      case ArrayType(e @ (StringType | IntegerType), _) => Some(e)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<string> or two array<int> " +
            s"arguments, got ${left.dataType.simpleString}, " +
            right.dataType.simpleString)
    }
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    if (isIntKernel)
      TextHash.sortedIntersectCountInt(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      TextHash.sortedIntersectCount(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = if (isIntKernel) "sortedIntersectCountInt"
      else "sortedIntersectCount"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHash.$kernel($a, $b)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

/** Polynomial rolling hash (oracle-portable semantics). */
case class RollingHashExpr(child: Expression) extends TextHashExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"
  override def nullSafeEval(input: Any): Any =
    TextHash.rollingHash(input.asInstanceOf[UTF8String])
  protected def staticCall(c: String): String =
    s"graft.functions.TextHash.rollingHash($c)"
  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}
