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

  /** Ids of corpus documents sharing at least one n-gram with `bench`. */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    grams(corpus, idCol, textCol, n)
      .join(broadcast(grams(bench, idCol, textCol, n)
        .select("gram").distinct()), Seq("gram"), "left_semi")
      .select(idCol).distinct()

  /** The corpus with contaminated documents removed (LEFT ANTI against
    * the broadcast gram set — same plan shape, negated). */
  def decontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    corpus.join(
      contaminatedIds(corpus, bench, idCol, textCol, n),
      Seq(idCol), "left_anti")
}
