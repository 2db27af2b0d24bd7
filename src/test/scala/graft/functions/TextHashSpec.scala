package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class TextHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val u = UTF8String.fromString _

  test("shingle set: distinct, sorted, short-doc fallback") {
    val sh = TextHash.shingleSet(u("a b c d a b c"), 3)
    val expect = Set("a b c", "b c d", "c d a", "d a b")
    assert(scala.jdk.CollectionConverters.SetHasAsScala(sh).asScala == expect)
    val short = TextHash.shingleSet(u("x y"), 3)
    assert(scala.jdk.CollectionConverters.SetHasAsScala(short).asScala == Set("x y"))
    assert(scala.jdk.CollectionConverters.SetHasAsScala(
      TextHash.shingleSet(u(""), 3)).asScala == Set(""))
  }

  test("gram_hashes: byte-identity with string-gram hashes, fallback, distinct") {
    import scala.jdk.CollectionConverters._
    // streamed token fold must equal hashing the joined gram STRING —
    // the equality Decontaminate's hash screen rests on (incl. a
    // multi-whitespace separator and a non-ASCII token)
    val text = "alpha  beta\tgamma δelta beta gamma δelta x"
    val got = TextHash.gramHashes(u(text), 3)
    val want = TextHash.shingleSet(u(text), 3).asScala
      .map(g => TextHash.gramHash64(u(g))).toSet
    assert((0 until got.numElements()).map(got.getLong).toSet === want)
    // distinct: repeated grams hash once
    val rep = TextHash.gramHashes(u("a b a b a b"), 2)
    assert(rep.numElements() === 2) // "a b", "b a"
    // short-doc fallback: single whole-join gram
    val short = TextHash.gramHashes(u("x  y"), 3)
    assert(short.numElements() === 1)
    assert(short.getLong(0) === TextHash.gramHash64(u("x y")))
    // empty text: the empty gram, same as shingleSet
    assert(TextHash.gramHashes(u(""), 3).getLong(0) ===
      TextHash.gramHash64(u("")))
    // column API through a codegen projection
    val df = Seq((1L, text)).toDF("id", "t")
      .select(explode(gram_hashes(col("t"), 3)).as("gh"))
    assert(df.collect().map(_.getLong(0)).toSet === want)
  }

  test("tokenizer boundary is RE2's \\s (5 chars) — wider-class whitespace is a TOKEN char") {
    import scala.jdk.CollectionConverters._
    // chars where a WIDER whitespace class disagrees with RE2's \s
    // (the DuckDB oracles' class, hence the REFERENCE): U+000B
    // vertical tab is whitespace under Java \s and isWhitespace but
    // NOT under RE2; the Unicode points only under isWhitespace. If
    // any engine producer split on one of these while the oracle kept
    // it inside a token, a corpus doc sharing a string gram with the
    // bench could fail the hashed-gram screen and never reach the
    // exact verify — a silent false negative Decontaminate's
    // exactness contract forbids.
    val wider = Seq('\u000B', '\u2028', '\u1680', '\u2000', '\u200A',
      '\u3000', '\u001C')
    for (c <- wider) {
      val text = s"foo${c}bar baz qux quux corge"
      val strToks = text.split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty).toSeq
      val natToks = TextHash.tokenize(text).asScala.toSeq
      assert(natToks === strToks, s"U+${c.toInt.toHexString}")
      assert(natToks.contains(s"foo${c}bar"), s"U+${c.toInt.toHexString}")
      // gram byte-identity holds through the non-splitting char
      val got = TextHash.gramHashes(u(text), 2)
      val want = TextHash.shingleSet(u(text), 2).asScala
        .map(g => TextHash.gramHash64(u(g))).toSet
      assert((0 until got.numElements()).map(got.getLong).toSet === want)
    }
    // ... while the five RE2 \s chars DO split (and U+000B does NOT)
    assert(TextHash.tokenize("a\tb\nc\fd\re f").asScala.toSeq ===
      Seq("a", "b", "c", "d", "e", "f"))
    assert(TextHash.tokenize("c\u000Bd").asScala.toSeq === Seq("c\u000Bd"))
  }

  test("minhash: equal docs equal sigs; disjoint docs disagree") {
    val a = TextHash.minhashSig(u("the quick brown fox jumps over the lazy dog"), 3, 32)
    val b = TextHash.minhashSig(u("the quick brown fox jumps over the lazy dog"), 3, 32)
    val c = TextHash.minhashSig(u("completely different words entirely here now ok"), 3, 32)
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq !== c.toSeq)
    assert(a.length === 32)
  }

  test("minhash sig agreement tracks jaccard (statistical)") {
    // two docs sharing most shingles should agree on most signature slots
    val d1 = (1 to 50).map(i => s"w$i").mkString(" ")
    val d2 = (1 to 48).map(i => s"w$i").mkString(" ") + " x y"
    val s1 = TextHash.minhashSig(u(d1), 3, 128)
    val s2 = TextHash.minhashSig(u(d2), 3, 128)
    val agree = s1.zip(s2).count { case (x, y) => x == y } / 128.0
    assert(agree > 0.75, s"agreement $agree")
  }

  test("band buckets: identical docs share all bands") {
    val b1 = TextHash.minhashBands(u("a b c d e f g"), 3, 8, 4)
    val b2 = TextHash.minhashBands(u("a b c d e f g"), 3, 8, 4)
    assert(b1.toLongArray().toSeq === b2.toLongArray().toSeq)
    assert(b1.numElements() === 8)
  }

  test("simhash: equal docs equal; near docs near; far docs far") {
    val base = (1 to 100).map(i => s"tok$i").mkString(" ")
    val near = (1 to 99).map(i => s"tok$i").mkString(" ") + " other"
    val far = (200 to 300).map(i => s"zz$i").mkString(" ")
    val hb = TextHash.simhash64(u(base))
    assert(hb === TextHash.simhash64(u(base)))
    val dNear = java.lang.Long.bitCount(hb ^ TextHash.simhash64(u(near)))
    val dFar = java.lang.Long.bitCount(hb ^ TextHash.simhash64(u(far)))
    assert(dNear < dFar)
    assert(dNear <= 10, s"near distance $dNear")
  }

  test("rolling hash matches the reference fold") {
    // h = fold(h*31 + (17*len + firstCharCode)) mod 1e9+7 over [a-z0-9]+ of lower
    def ref(text: String): Long = {
      val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
      toks.foldLeft(0L)((h, w) => (h * 31 + (17L * w.length + w.head.toLong)) % 1000000007L)
    }
    for (s <- Seq("Hello, World 42!", "a", "", "ONE two THREE four85 ..x"))
      assert(TextHash.rollingHash(u(s)) === ref(s), s)
  }

  test("column API round-trips through codegen projection") {
    val df = Seq("a b c d e", "x y z w v", "a b c d e").toDF("t")
    val rows = df.select(
      minhash_sig($"t", 3, 8).as("sig"),
      simhash64($"t").as("sh"),
      rolling_hash($"t").as("rh"),
      shingle_set($"t", 3).as("ss")).collect()
    assert(rows(0).getSeq[Long](0) === rows(2).getSeq[Long](0))
    assert(rows(0).getLong(1) === rows(2).getLong(1))
    assert(rows(0).getLong(2) === rows(2).getLong(2))
    assert(rows(0).getSeq[String](3) === Seq("a b c", "b c d", "c d e"))
    assert(rows(0).getSeq[Long](0) !== rows(1).getSeq[Long](0))
  }

  test("sorted_intersect_count: kernel parity with array_intersect on both element types") {
    // string kernel — shingle_set output is binary-sorted by contract
    val df = Seq(
      ("a b c d e f", "c d e f g h"),   // overlapping shingle sets
      ("a b c", "x y z"),               // disjoint
      ("a b c d", "a b c d")            // identical
    ).toDF("l", "r")
      .select(shingle_set($"l", 2).as("sl"), shingle_set($"r", 2).as("sr"))
    val got = df.select(
      sorted_intersect_count($"sl", $"sr").as("n"),
      size(array_intersect($"sl", $"sr")).as("want")).collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
    assert(got.map(_.getInt(0)).toSeq === Seq(3, 0, 3))
    // int kernel over hash-compressed sets, duplicates collapse to
    // multiset-min semantics — counted against the sorted merge by hand
    val ints = Seq((Seq(1, 3, 3, 7, 9), Seq(3, 3, 5, 9, 11)))
      .toDF("a", "b")
      .select(sorted_intersect_count($"a", $"b").as("n")).head()
    assert(ints.getInt(0) === 3) // 3, 3, 9
    // null in → null out (nullIntolerant)
    val n = Seq(("a b c", Option.empty[String])).toDF("l", "r")
      .select(sorted_intersect_count(shingle_set($"l", 2),
        shingle_set($"r", 2)).as("n")).head()
    assert(n.isNullAt(0))
  }
}
