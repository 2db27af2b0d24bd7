package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches DuckDB jaro_winkler_similarity on pinned pairs") {
    // values probed from DuckDB (the oracle engine) — byte-level
    // comparison, 0.7 boost threshold, prefix cap 4, empty → 0
    val pinned = Seq(
      ("martha", "marhta") -> 0.9611111111111111,
      ("dixon", "dicksonx") -> 0.8133333333333332,
      ("jellyfish", "smellyfish") -> 0.8962962962962964,
      ("", "abc") -> 0.0,
      ("", "") -> 0.0,
      ("abc", "abc") -> 1.0,
      ("a", "b") -> 0.0,
      ("ab", "ba") -> 0.0,
      ("DWAYNE", "DUANE") -> 0.8400000000000001,
      ("pennsylvania", "pencilvaneya") -> 0.8314814814814815,
      ("aaaaaaaaaa", "aaaaaaaaab") -> 0.96,
      // boost threshold: jaro = 0.5 ≤ 0.7 → no prefix bonus
      ("abcdefgh", "abzzzzzz") -> 0.5,
      ("aaaaaaa", "aabbbbbbbbbb") -> 0.48412698412698413,
      // multi-byte: comparison runs over UTF-8 bytes
      ("ñandú", "ñandu") -> 0.9095238095238095,
      ("ABCDEFG", "abcdefg") -> 0.0)
    pinned.foreach { case ((a, b), want) =>
      assert(math.abs(jw(a, b) - want) < 1e-12, s"jw($a, $b)")
    }
  }

  test("symmetry and range invariants on arbitrary pairs") {
    val words = Seq("alpha", "alphabet", "beta", "", "a", "ab", "ba",
      "ñandú", "straße", "STRASSE", "miss", "mississippi")
    for (a <- words; b <- words) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"range: $a/$b")
      assert(math.abs(s - jw(b, a)) < 1e-15, s"symmetry: $a/$b")
      if (a == b && a.nonEmpty) assert(s === 1.0)
    }
  }

  test("column function works under codegen and handles nulls") {
    val df = Seq(("martha", "marhta"), (null, "x"), ("x", null))
      .toDF("a", "b")
      .select(jaro_winkler($"a", $"b").as("s"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))
  }
}
