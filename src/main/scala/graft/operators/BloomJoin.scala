package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.might_contain_bloom

/** Bloom-prefiltered semi/anti joins — EXACT results, sketch-sized
  * data movement.
  *
  * The target regime is a probe side too large to shuffle casually
  * and a filter side too large to broadcast as a hash relation but
  * small enough to SKETCH: 10M keys at 1% fpp is a ~11 MB bloom — two
  * orders of magnitude under the equivalent broadcast hash table.
  * The bloom is built distributed (per-partition sketches, tree-merged
  * — the classic `treeAggregate` sketch pattern), shipped once per
  * executor, and applied MAP-SIDE before any exchange:
  *
  *  - semi join: only rows that might match (true-positive fraction
  *    + fpp of the rest) reach the shuffle; the exact semi join then
  *    removes the false positives, so results are identical to the
  *    plain semi join.
  *  - anti join: rows the bloom rejects are DEFINITELY absent from
  *    the filter side — they bypass the join entirely and flow
  *    straight to the output; only the maybe-sliver joins. Two scans
  *    of the probe side (both pushdown-friendly, zero shuffle) buy
  *    the disappearance of the full-relation exchange — the right
  *    trade at 100 TB, where scans are cheap and shuffles are not.
  *
  * NULL keys follow join-equality semantics: dropped for semi (null
  * matches nothing), kept via the bypass branch for anti.
  */
object BloomJoin {

  /** Distributed bloom build over `df(key)`. Integral keys are
    * inserted with `putLong`, strings as UTF-8 bytes — the exact
    * symmetry [[graft.functions.BloomMightContain]] probes with.
    *
    * @param expectedItems sizing, not a cap: overshooting wastes
    *   bits, undershooting inflates fpp — pass the approximate
    *   distinct count of the filter side.
    */
  def bloomOf(df: DataFrame, key: String, expectedItems: Long,
      fpp: Double = 0.01): BloomFilter = {
    val rows = df.select(col(key)).na.drop()
    rows.rdd.treeAggregate(BloomFilter.create(expectedItems, fpp))(
      seqOp = (bf, row) => {
        row.get(0) match {
          case s: String => bf.putBinary(s.getBytes("UTF-8"))
          case n: java.lang.Number => bf.putLong(n.longValue())
          case other => throw new IllegalArgumentException(
            s"bloom key must be integral or string, got ${other.getClass}")
        }
        bf
      },
      combOp = (a, b) => { a.mergeInPlace(b); a },
      depth = 2)
  }

  /** Exact semi join with a map-side bloom prefilter on the probe
    * side. `big` keeps its rows that have a match in `small`. */
  def semiJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = bloomOf(small, smallKey, expectedItems, fpp)
    big
      .filter(col(bigKey).isNotNull &&
        might_contain_bloom(col(bigKey), bloom))
      .join(small, big(bigKey) === small(smallKey), "left_semi")
  }

  /** Exact anti join: bloom-negative rows (and null keys) bypass the
    * join; only possible matches pay the shuffle. */
  def antiJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = bloomOf(small, smallKey, expectedItems, fpp)
    val probe = might_contain_bloom(col(bigKey), bloom)
    val bypass = big.filter(col(bigKey).isNull || !probe)
    val maybe = big
      .filter(col(bigKey).isNotNull && probe)
      .join(small, big(bigKey) === small(smallKey), "left_anti")
    bypass.unionByName(maybe)
  }
}
