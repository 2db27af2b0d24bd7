package graft.dedup

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact substring (token-window) dedup: planted-span semantics plus a
  * brute-force cross-check on the fixture corpus. */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val span = "alpha beta gamma delta"

  // doc 1 carries the span first (keeper); docs 2 and 3 repeat it; doc 4
  // is clean; doc 5 is shorter than the window and must pass untouched.
  private lazy val planted = Seq(
    (1L, s"one two $span three four"),
    (2L, s"x y $span z w"),
    (3L, s"$span tail tail2 tail3"),
    (4L, "entirely fresh words nothing shared here at all"),
    (5L, "tiny doc")
  ).toDF("doc_id", "text")

  test("non-keeper occurrences are removed, keeper and clean docs survive") {
    val out = Dedup.spanDedup(planted, "doc_id", "text", w = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // keeper: doc 1 keeps everything
    assert(out(1L) === ((8L, 0L, s"one two $span three four")))
    // doc 2: the 4 span tokens vanish, the rest survive in order
    assert(out(2L) === ((8L, 4L, "x y z w")))
    // doc 3: span at position 1
    assert(out(3L) === ((7L, 4L, "tail tail2 tail3")))
    assert(out(4L)._2 === 0L)
    // shorter than the window: no occurrences, verbatim token join
    assert(out(5L) === ((2L, 0L, "tiny doc")))
  }

  test("overlapping duplicated spans union their coverage") {
    // docs 11/12 share a 6-token run; with w=4 that is three duplicated
    // windows in each, overlapping — removal must union, not double count
    val run = "p q r s t u"
    val df = Seq((11L, s"$run end1"), (12L, s"start2 $run")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(df, "doc_id", "text", w = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(11L) === ((0L, s"$run end1"))) // first in (doc,start) order
    assert(out(12L) === ((6L, "start2")))
  }

  test("duplicatedSpans flags exactly one keeper per span") {
    val spans = Dedup.duplicatedSpans(planted, "doc_id", "text", w = 4)
    val perSpan = spans.groupBy("span")
      .agg(sum(when($"is_keeper", 1).otherwise(0)).as("keepers"),
        count(lit(1)).as("occ"), first("n_occurrences").as("n"))
      .collect()
    assert(perSpan.nonEmpty)
    perSpan.foreach { r =>
      assert(r.getLong(1) === 1L, s"span ${r.getString(0)} keeper count")
      assert(r.getLong(2) === r.getLong(3))
    }
    // keeper is the minimum (doc, start): doc 1 holds it for the planted span
    val k = spans.filter($"is_keeper" && $"span" === span).collect()
    assert(k.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("fixture corpus: spanDedup matches a single-stage brute force") {
    val docs = TestSpark.table("documents").limit(200)
    val got = Dedup.spanDedup(docs, "doc_id", "text", w = 8)
    // brute force: group the window STRINGS directly (no hash screen)
    val toks = docs.select($"doc_id", graft.text.TextOps.tokens($"text").as("ts"))
    val occ = toks.filter(size($"ts") >= 8)
      .select($"doc_id", explode(sequence(lit(1), size($"ts") - 7)).as("s"), $"ts")
      .select($"doc_id", $"s", concat_ws(" ", slice($"ts", $"s", lit(8))).as("wtext"))
    val dup = occ.groupBy("wtext")
      .agg(min(struct($"doc_id", $"s")).as("keeper"), count(lit(1)).as("c"))
      .filter($"c" > 1)
    val removedTokens = occ.join(dup, "wtext")
      .filter(struct($"doc_id", $"s") =!= $"keeper")
      .select($"doc_id", explode(sequence($"s", $"s" + 7)).as("pos"))
      .distinct().groupBy("doc_id").agg(count(lit(1)).as("brute_removed"))
    val joined = got.join(removedTokens, Seq("doc_id"), "left")
      .select($"doc_id", $"n_removed", coalesce($"brute_removed", lit(0L)).as("b"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(1) === r.getLong(2), s"doc ${r.getLong(0)}"))
    // and at least one doc in the fixture actually loses tokens
    assert(got.filter($"n_removed" > 0).count() > 0)
  }
}
