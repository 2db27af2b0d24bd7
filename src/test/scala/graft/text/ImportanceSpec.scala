package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ImportanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("target-typical docs outrank raw-typical docs; scores are deterministic") {
    // Target slice speaks only {alpha beta}; the raw remainder speaks
    // only {gamma delta} except two probe docs. The RANKING is the
    // contract (DSIR selects by rank / relative weight): target-word
    // probes must outscore raw-word probes, target docs must outscore
    // raw docs. (Absolute signs are not asserted — with add-one
    // smoothing over 256 buckets a tiny corpus pulls every bucket
    // toward the prior, which squashes magnitudes but preserves
    // order.)
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta beta alpha", true),
      (3L, "gamma delta gamma delta", false),
      (4L, "gamma delta delta gamma", false),
      (5L, "alpha alpha alpha alpha", false), // raw doc, target-typical text
      (6L, "gamma gamma gamma gamma", false)  // raw doc, raw-typical text
    ).toDF("doc_id", "text", "is_t")
    val w = Importance.importanceWeights(docs, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(5) > w(6),
      s"target-vocabulary probe must outrank raw-vocabulary probe: $w")
    assert(w(1) > w(3) && w(2) > w(4),
      s"target docs must outrank raw docs: $w")
    // determinism: same input, same plan, same scores
    val w2 = Importance.importanceWeights(docs, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w === w2)
  }

  test("empty and whitespace-only docs are omitted, not scored 0") {
    val docs = Seq(
      (1L, "alpha beta", true),
      (2L, "", false),
      (3L, "   ", false),
      (4L, "alpha", false)
    ).toDF("doc_id", "text", "is_t")
    val ids = Importance.importanceWeights(docs, "doc_id", "text", col("is_t"))
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 4L))
  }

  test("n_tokens matches the tokenizer and selectTopFraction keeps the best k") {
    val docs = Seq(
      (1L, "alpha beta gamma", true),
      (2L, "delta delta", false),
      (3L, "alpha alpha alpha alpha alpha", false)
    ).toDF("doc_id", "text", "is_t")
    val w = Importance.importanceWeights(docs, "doc_id", "text", col("is_t"))
    assert(w.filter($"doc_id" === 3).select("n_tokens").as[Long].head() === 5L)
    val top = Importance.selectTopFraction(w, "doc_id", 1.0 / 3.0)
      .select("doc_id").as[Long].collect().toSet
    // doc 1 IS the target slice — its mix of target-only words (beta,
    // gamma appear nowhere else) beats doc 3, whose alpha is diluted
    // by doc 3's own dominance of the raw distribution
    assert(top === Set(1L))
  }
}
