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

  private def gramHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.gram_hashes(lower(col(textCol)), n)).as("gh"))

  /** Corpora whose Catalyst size estimate falls at or below this go
    * through the DIRECT string-gram semi join — no count job, no
    * bloom build, no second corpus pass. The hashed-gram screen's
    * fixed costs (eval count → bloom → an extra corpus scan) buy a
    * saving LINEAR in corpus size (measured 21.7× at the 1000×
    * decade), so at benchmark scale they exceed the whole query
    * (isolated sf0.1: 1.66 s screened vs ~0.8 s direct). Plan
    * statistics are free (no job); estimates err LARGE through joins,
    * which errs toward the screen — the correct direction at scale —
    * and both paths are gram-for-gram exact, so the choice never
    * changes a result. */
  val SmallCorpusBytes: Long = 32L * 1024 * 1024

  /** Ids of corpus documents sharing at least one n-gram with `bench`.
    *
    * Exact-preserving gates, cheapest first — above
    * [[SmallCorpusBytes]] the corpus side never materializes a gram
    * STRING (the 1000× curation probe put gram-string construction at
    * the top of this stage's cost):
    *
    *  1. HASHED-GRAM screen: the corpus explodes 8-byte gram hashes
    *     (native [[graft.functions.gram_hashes]] — tokens folded
    *     straight into the hash, no per-gram string), each probing a
    *     BLOOM of the eval gram-hash set (~MB-scale, cache-resident),
    *     then the survivors meet the broadcast eval hash set in an
    *     exact semi join. Equal grams hash equal, so no true
    *     contaminated doc can be lost; a 64-bit collision can only ADD
    *     a candidate.
    *  2. VERIFY on the candidates only: candidate docs (≈ truly
    *     contaminated + ~n_grams·n_eval/2⁶⁴ collisions ≈ none)
    *     re-explode as REAL gram strings and semi-join the broadcast
    *     eval gram strings — the final result is exactly the
    *     string-join answer, gram-for-gram.
    *
    * Benchmark-scale corpora skip straight to a whole-corpus stage 2
    * (the [[SmallCorpusBytes]] gate). The eval side is benchmark-sized
    * by contract, so its repeated small scans (count → bloom build →
    * broadcasts) are cheap. */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int,
      smallCorpusBytes: Long = SmallCorpusBytes): DataFrame = {
    val small = corpus.queryExecution.optimizedPlan.stats.sizeInBytes
      .isValidLong && corpus.queryExecution.optimizedPlan.stats
      .sizeInBytes.toLong <= smallCorpusBytes
    val candidates =
      if (small) corpus
      else {
        val evalHashes = gramHashes(bench, idCol, textCol, n)
          .select("gh").distinct()
        val nHashes = math.max(evalHashes.count(), 1L)
        val bloom =
          graft.operators.BloomJoin.bloomOf(evalHashes, "gh", nHashes)
        val candidateIds = gramHashes(corpus, idCol, textCol, n)
          .filter(graft.functions.might_contain_bloom(col("gh"), bloom))
          .join(broadcast(evalHashes), Seq("gh"), "left_semi")
          .select(idCol).distinct()
        corpus.join(candidateIds, Seq(idCol), "left_semi")
      }
    grams(candidates, idCol, textCol, n)
      .join(broadcast(grams(bench, idCol, textCol, n)
        .select("gram").distinct()), Seq("gram"), "left_semi")
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
