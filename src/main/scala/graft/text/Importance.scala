package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection scoring for pretraining corpora: hashed n-gram
  * importance weights in the style of DSIR (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169). The reference pipeline filters its corpus with
  * static per-row rules (`Datos/preprocessing.py` quality drops); this
  * is the corpus-level upgrade a 100 TB training-data pipeline needs:
  * score every raw document by how target-like its token distribution
  * is, then keep the top of the ranking (or Gumbel-sample against the
  * weights) to hit a token budget.
  *
  * Method: features are unigrams hashed into a small fixed bucket
  * space; a target subset (e.g. `lang = 'en'`, a curated slice, a
  * wiki-like domain) and the full raw corpus each induce a smoothed
  * categorical distribution over buckets; a document's weight is the
  * mean log-likelihood ratio of its token stream. Hashing makes the
  * "vocabulary" a constant (the bucket count), so the model state is
  * broadcastable no matter how large the corpus grows — the trick that
  * makes DSIR work at web scale.
  *
  * Engine-portability: the feature hash is the first two hex chars of
  * md5 (256 buckets), computable identically in Spark and any SQL
  * oracle engine — same portable-hash idiom as the md5-threshold
  * sampler (`Features.deterministicSample`).
  *
  * Scale shape: one linear token explode, one 256-group aggregate
  * (map-side partial combine collapses each partition to ≤256 rows),
  * the bucket model re-joined map-side as a broadcast, one final
  * per-document aggregate. No global windows, no driver collect.
  */
object Importance {

  /** Number of hashed feature buckets — fixed by the 2-hex-char md5
    * prefix scheme so the oracle SQL can reproduce it verbatim. */
  val NumBuckets = 256

  /** Portable hashed feature id: first two hex chars of md5(token). */
  def featureBucket(tok: Column): Column = substring(md5(tok), 1, 2)

  /** Per-document DSIR importance weight.
    *
    * @param isTarget boolean Column over `docs`' columns selecting the
    *                 target slice whose distribution raw docs are
    *                 scored against (e.g. `col("lang") === "en"`).
    * @return one row per input document that has ≥1 token:
    *         (idCol, n_tokens, dsir) where dsir is the mean
    *         log((p_target(b)+eps)/(p_raw(b)+eps)) over its token
    *         stream, add-one smoothed, rounded to 6 places.
    *         Empty/whitespace-only documents have no token evidence
    *         and are omitted (score undefined, not 0 — a 0 would fake
    *         "exactly corpus-typical").
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val toks = docs
      .select(col(idCol), isTarget.as("__t"),
        explode(TextOps.tokens(col(textCol))).as("__tok"))
      .withColumn("__b", featureBucket(col("__tok")))
      .drop("__tok")
    // Bucket counts under both distributions in ONE pass over the
    // token stream (target tokens count toward both).
    val counts = toks.groupBy(col("__b")).agg(
      sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("__ct"),
      count(lit(1)).as("__cr"))
    // Corpus totals: a 1-row relation, attached by broadcast cross
    // join — the model stays a plan, nothing touches the driver.
    val totals = broadcast(
      counts.agg(sum(col("__ct")).as("__tt"), sum(col("__cr")).as("__tr")))
    val model = broadcast(counts.crossJoin(totals).select(col("__b"),
      (log((col("__ct") + lit(1.0)) / (col("__tt") + lit(NumBuckets.toDouble)))
        - log((col("__cr") + lit(1.0)) / (col("__tr") + lit(NumBuckets.toDouble))))
        .as("__lr")))
    // Score: mean log-ratio over the document's token stream. The
    // model join is broadcast (≤256 rows) — pure map-side.
    toks.join(model, Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), round(avg(col("__lr")), 6).as("dsir"))
  }

  /** [[importanceWeights]] composed with a budget: keep the top
    * `keepFraction` of documents by weight, ties broken by id for
    * determinism. Selection by distributed rank (no global window):
    * the weight relation re-ranks via percent_rank semantics only if
    * needed — here a simple threshold on the exact count suffices via
    * a TakeOrdered-style limit when k is small, or a per-partition
    * filter against the k-th weight otherwise. For the library surface
    * we expose the simple exact form: order by (dsir desc, id) and
    * keep the first k — Spark plans the limit as per-partition heaps.
    */
  def selectTopFraction(weights: DataFrame, idCol: String,
      keepFraction: Double): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1,
      s"keepFraction must be in (0,1], got $keepFraction")
    val k = math.max(1L, math.ceil(weights.count() * keepFraction).toLong)
    require(k <= Int.MaxValue, "top-fraction limit exceeds Int.MaxValue; " +
      "use a weight-threshold filter at this scale")
    weights.orderBy(col("dsir").desc, col(idCol)).limit(k.toInt)
  }
}
