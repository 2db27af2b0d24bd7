package graft.plans

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Every query in the engine's surface passes the scale lint — no
  * accidental cartesians/nested loops, and every global window is a
  * DOCUMENTED bounded-relation decision (listed here, with why).
  * Single-partition exchanges are not asserted: at spec scale AQE and
  * range sampling legitimately coalesce tiny shuffles to one
  * partition, which says nothing about the 100 TB shape.
  */
class QuerySurfaceLintSpec extends AnyFunSuite {

  /** Global windows over provably bounded relations (dim-sized or
    * summary-sized by construction) — each documented at its
    * definition site. */
  private val boundedGlobalWindow = Set(
    "q07_dim",          // SurrogateKeys.assignIds: dims are dim-sized
    "q16_label_encode", // label domain is dim-sized
    "q36_esi_etl",      // dim build (GROUPING SETS output, dim-sized)
    "q47_dim_append",   // dim append: dim-sized
    "q58_tensor_prep",  // encoder domains: dim-sized
    "q80_chi2",         // contingency-table-sized marginals
    "q95_histogram",    // bins-sized cumulative pass
    "q115_gaps",        // bucket-summary window (bounded by id-range/width)
    "q116_mutual_info", // contingency-table-sized marginals
    "q121_abc",         // running share over the BRAND-sized aggregate
    "q124_sorted_neighborhood", // partition-offset window over a P-row count relation
    "q128_growth_curve", // running sum over the observed-DAY spine (bounded)
    "q130_lift",        // totals window over the BIN-sized aggregate
    "q133_auc",         // rank window over the DISTINCT-SCORE relation
                        // (grid-quantize scores first when unbounded)
    "q144_gini")        // same pattern: cumulative over DISTINCT VALUES

  /** Intentional non-equi/cross shapes at dim scale (tiny sides). */
  private val boundedCross = Set(
    "q33_fuzzy",        // probes × dim, both driver-small, broadcast
    "q104_hll_intersect", // C(types,2) sketch pairs — types-sized
    "q107_jaro_winkler",  // probes × nation dim
    "q182_pq_topk",     // ADC scan: broadcast QUERY BATCH × codes is
                        // the PQ design (Pq.adcTopK scaladoc) — the
                        // scan is the operator, the broadcast side is
                        // the bounded probe set
    "q185_pq_sample",   // same ADC scan shape, sampled-fit codebooks
    "q196_lsh_tune",    // divisors(sigLen) × 99-point grid — both sides
                        // constant-sized by construction (Dedup.tuneBands)
    "q226_closure_move", // closureMove's subtree × ancestors-of-
                        // newParent cross join: the broadcast side is
                        // DEPTH-sized (tree height rows — ≤7 on the
                        // digit tree), the designed shape (Hierarchy
                        // scaladoc)
    "q227_closure_ops")  // the same closureMove shape inside the
                        // move+insert+delete lifecycle chain

  test("every SparkEntry query passes the scale lint (allowlisted exceptions only)") {
    val spark = TestSpark.spark
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val findings = try PlanLint.check(fn(spark, TestSpark.sf)) catch {
          case e: Throwable => Seq(s"LINT_ERROR: ${e.getMessage}")
        }
        val relevant = findings.filter { f =>
          (f.startsWith("CARTESIAN") || f.startsWith("NESTED_LOOP")) &&
            !boundedCross.contains(name) ||
            f.startsWith("GLOBAL_WINDOW") &&
              !boundedGlobalWindow.contains(name) ||
            f.startsWith("LINT_ERROR")
        }
        relevant.map(f => s"$name: $f")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
