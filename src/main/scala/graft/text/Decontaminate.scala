package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the train/eval hygiene pass every
  * large-scale training pipeline runs before a corpus ships: any
  * training document sharing a word n-gram with an evaluation set is
  * contaminated and must be flagged/removed (the GPT-3 appendix-C
  * 13-gram rule; `n` is a parameter because the right width depends on
  * vocabulary size).
  *
  * Scale shape: the eval side is benchmark-sized (thousands of docs,
  * millions of grams) — its DISTINCT gram set broadcasts. The corpus
  * side explodes to grams map-side and LEFT SEMI joins against the
  * broadcast, so the 100 TB side never shuffles: contaminated ids fall
  * out of a streaming broadcast-hash-semi-join and only the id column
  * reaches the final distinct. Nothing here is O(corpus × bench).
  *
  * Short documents (< n tokens) hash as their whole text — one gram —
  * so an eval question shorter than the window still decontaminates its
  * exact copies ([[TextOps.wordShingles]] semantics).
  */
object Decontaminate {

  private def grams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol),
      explode(TextOps.wordShingles(lower(col(textCol)), n)).as("gram"))

  /** Ids of corpus documents sharing at least one n-gram with `bench`.
    *
    * The corpus-side grams pass a BLOOM of the eval gram set before
    * the exact semi join ([[graft.operators.BloomJoin]] machinery):
    * the bloom is ~11 MB at 10M grams where the broadcast hash
    * relation of full gram strings runs to GBs, so the overwhelmingly
    * non-contaminated gram stream is rejected by a cache-resident
    * probe and only the maybe-sliver (true hits + fpp of the rest)
    * ever touches the hash relation. False positives are removed by
    * the exact semi join, so the result is identical — the 1000×
    * curation probe put this stage at 52% of the q177 chain; the
    * bloom probe is the cheap first gate. The eval side is
    * benchmark-sized by contract, so sizing it (one count) and
    * building the bloom (one treeAggregate pass) are cheap repeated
    * scans of a small plan. */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val evalGrams = grams(bench, idCol, textCol, n).select("gram").distinct()
    val nGrams = math.max(evalGrams.count(), 1L)
    val bloom = graft.operators.BloomJoin.bloomOf(evalGrams, "gram", nGrams)
    grams(corpus, idCol, textCol, n)
      .filter(graft.functions.might_contain_bloom(col("gram"), bloom))
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .select(idCol).distinct()
  }

  /** The corpus with contaminated documents removed (LEFT ANTI against
    * the broadcast gram set — same plan shape, negated). */
  def decontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    corpus.join(
      contaminatedIds(corpus, bench, idCol, textCol, n),
      Seq(idCol), "left_anti")
}
