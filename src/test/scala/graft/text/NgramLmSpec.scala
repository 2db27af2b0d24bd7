package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NgramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigrams are the adjacent pairs, lowercased, in order") {
    val df = Seq((1L, "The quick Brown fox")).toDF("doc_id", "text")
    val got = NgramLm.bigrams(df, "doc_id", "text")
      .select("w1", "w2").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("the", "quick"), ("quick", "brown"), ("brown", "fox")))
  }

  test("single-token and empty docs emit no bigrams, no score") {
    val df = Seq((1L, "one"), (2L, " "), (3L, "a b")).toDF("doc_id", "text")
    assert(NgramLm.perplexity(df, "doc_id", "text").select("doc_id")
      .collect().map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("perplexity matches a driver-side replay on a micro corpus") {
    val df = Seq(
      (1L, "a b a b a b"),
      (2L, "a b c d e f"),
      (3L, "b a b a")
    ).toDF("doc_id", "text")
    val got = NgramLm.perplexity(df, "doc_id", "text", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // replay: corpus bigram/unigram counts over all three docs
    val docs = Map(
      1L -> Seq("a", "b", "a", "b", "a", "b"),
      2L -> Seq("a", "b", "c", "d", "e", "f"),
      3L -> Seq("b", "a", "b", "a"))
    val bigs = docs.view.mapValues(ts => ts.zip(ts.tail)).toMap
    val allB = bigs.values.flatten.toSeq
    val cb = allB.groupBy(identity).view.mapValues(_.size).toMap
    val cw = allB.groupBy(_._1).view.mapValues(_.size).toMap
    val vs = docs.values.flatten.toSet.size
    docs.keys.foreach { id =>
      val lps = bigs(id).map { b =>
        val lp = math.log((cb(b) + 0.5) / (cw(b._1) + 0.5 * vs))
        math.rint(lp * 1e9) / 1e9
      }
      val mlp = BigDecimal(lps.map(BigDecimal(_)).sum.toDouble).toDouble / lps.size
      val want = math.rint(math.exp(-mlp) * 1e6) / 1e6
      val (n, ppl) = got(id)
      assert(n === bigs(id).size.toLong, s"doc $id n_bigrams")
      assert(math.abs(ppl - want) < 1e-9, s"doc $id ppl got $ppl want $want")
    }
    // direction: the repetitive doc is less surprising than the all-rare one
    assert(got(1L)._2 < got(2L)._2)
  }

  test("perplexityGate keeps exactly the quantile band") {
    val docs = TestSpark.table("documents").limit(300)
    val ppl = NgramLm.perplexity(docs, "doc_id", "text")
    val Array(lo, hi) = ppl.stat.approxQuantile("ppl", Array(0.1, 0.9), 0.0)
    val want = ppl.filter($"ppl".between(lo, hi)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val got = NgramLm.perplexityGate(docs, "doc_id", "text", 0.1, 0.9)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    assert(got.nonEmpty && got.size < 300)
  }
}
