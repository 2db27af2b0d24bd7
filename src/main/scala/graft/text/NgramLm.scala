package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language model scoring — the CCNet-style
  * perplexity quality gate (Wenzek et al., "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data", LREC 2020):
  * rank documents by how (un)surprising they are under a language
  * model and gate the tail. CCNet uses a pretrained KenLM; with no
  * external model available the honest in-engine equivalent is a
  * self-trained add-α bigram model — perplexity under the corpus's
  * own statistics, which is exactly the repetition-vs-gibberish axis
  * the gate needs (boilerplate scores low, lorem-noise scores high).
  *
  * Scale shape: counts are groupBys on token keys (map-side combined;
  * the unigram/bigram count relations are VOCABULARY-sized, not
  * corpus-sized); scoring joins the per-document bigram stream
  * against them on the same keys — at 100 TB the count tables are
  * the natural broadcast side once the vocabulary stabilizes, and
  * the per-doc aggregate keys on the doc id. Everything between is a
  * projection.
  *
  * Cross-engine determinism: each bigram's log-probability is rounded
  * to a 9-decimal grid, per-document sums accumulate in
  * DECIMAL(38,12) (order-independent — partial aggregation plans
  * cannot perturb them), and the final perplexity rounds to 6 — the
  * repo's standard contract (see `Queries.scala` header). */
object NgramLm {

  private def toks(text: Column): Column = TextOps.tokens(lower(text))

  /** Per-document bigram stream: (id, w1, w2) — one row per adjacent
    * token pair, via two aligned slices (no self-join, no window). */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), toks(col(textCol)).as("__ts"))
      .filter(size(col("__ts")) >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(col("__ts"), lit(1), size(col("__ts")) - 1).as("w1"),
        slice(col("__ts"), lit(2), size(col("__ts")) - 1).as("w2"))).as("__b"))
      .select(col(idCol), col("__b.w1").as("w1"), col("__b.w2").as("w2"))

  /** Add-α bigram perplexity of every document under the corpus's own
    * counts: exp(−mean log P(w2|w1)), P = (C(w1,w2)+α)/(C(w1)+α·V).
    * Output (id, n_bigrams, ppl); documents with fewer than 2 tokens
    * emit nothing (no bigram evidence — gate them on length instead). */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.5): DataFrame = {
    val big = bigrams(docs, idCol, textCol)
    val uni = big.groupBy(col("w1").as("__uw")).agg(count(lit(1)).as("__cw"))
    val bi = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__cb"))
    val vocab = docs.select(explode(toks(col(textCol))).as("__t"))
      .agg(countDistinct(col("__t")).as("__vs"))
    val scored = big
      .join(bi, Seq("w1", "w2"))
      .join(uni, big("w1") === uni("__uw"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        round(log((col("__cb") + lit(alpha)) /
          (col("__cw") + lit(alpha) * col("__vs"))), 9).as("__lp"))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("__lp").cast("decimal(38,12)")).cast("double") /
          count(lit(1))).as("__mlp"))
      .select(col(idCol), col("n_bigrams"),
        round(exp(-col("__mlp")), 6).as("ppl"))
  }

  /** The gate composition: documents whose perplexity lies inside
    * [lo, hi] quantiles of the corpus distribution — CCNet's
    * head/middle/tail cut, expressed as a two-pass plan (bounded
    * quantile state, then a broadcast range filter). */
  def perplexityGate(docs: DataFrame, idCol: String, textCol: String,
      loQ: Double, hiQ: Double, alpha: Double = 0.5): DataFrame = {
    val ppl = perplexity(docs, idCol, textCol, alpha)
    val Array(lo, hi) = ppl.stat.approxQuantile("ppl", Array(loQ, hiQ), 0.0)
    docs.join(ppl.filter(col("ppl").between(lo, hi)).select(col(idCol)),
      Seq(idCol), "left_semi")
  }
}
