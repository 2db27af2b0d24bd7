package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge

/** Column-level entry points for graft's custom Catalyst expressions. */
package object functions {

  /** Lowercase + NFD accent strip + whitespace collapse + trim, as a
    * codegen'd native expression (see [[NormalizeString]]). */
  def normalize_string(c: Column): Column =
    Bridge.column(NormalizeString(Bridge.expression(c)))

  /** k-view MinHash signature (`array<long>`) of the w-word shingle
    * set — native one-pass expression. */
  def minhash_sig(c: Column, width: Int, k: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(c), width, k))

  /** LSH band buckets (`array<long>`) of the MinHash signature. */
  def minhash_bands(c: Column, width: Int, bands: Int, r: Int): Column =
    Bridge.column(MinHashBandsExpr(Bridge.expression(c), width, bands, r))

  /** Sorted distinct w-word shingles (`array<string>`). */
  def shingle_set(c: Column, width: Int): Column =
    Bridge.column(ShingleSetExpr(Bridge.expression(c), width))

  /** Distinct 64-bit w-word gram hashes (`array<long>`) — the
    * no-string-materialization screen for n-gram containment joins
    * (equal grams hash equal across producers; see
    * [[TextHash.gramHashes]]). */
  def gram_hashes(c: Column, width: Int): Column =
    Bridge.column(GramHashesExpr(Bridge.expression(c), width))

  /** 64-bit SimHash over lowercase ascii word tokens. */
  def simhash64(c: Column): Column =
    Bridge.column(SimHashExpr(Bridge.expression(c)))

  /** Intersection count of two SORTED arrays (`array<string>` in
    * binary order, or `array<int>` ascending) — the zero-allocation
    * verification kernel for set-overlap joins. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCountExpr(
      Bridge.expression(a), Bridge.expression(b)))

  /** Oracle-portable polynomial rolling hash over word tokens. */
  def rolling_hash(c: Column): Column =
    Bridge.column(RollingHashExpr(Bridge.expression(c)))

  /** Fused dot product over `array<float|double>` — one codegen'd
    * loop per row (see [[DotProduct]] for why not zip_with/aggregate). */
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Bounded per-group top-k AGGREGATE (smallest k of `c`'s natural
    * ordering, ascending `array`): k-element heap per group at every
    * stage — never materializes a group's full row set the way
    * `collect_list` does (see [[BoundedTopKAgg]]). */
  def bounded_topk(c: Column, k: Int): Column =
    Bridge.column(BoundedTopKAgg(Bridge.expression(c), k).toAggregateExpression())

  /** Misra–Gries frequent-items sketch AGGREGATE: ≤ `capacity`
    * counters per partial buffer, mergeable, recall 1.0 for items
    * with frequency > N/(capacity+1). Returns
    * `array<struct<item,est>>` — candidates + lower bounds; see
    * [[graft.operators.HeavyHitters]] for the exact two-phase plan. */
  def freq_sketch(c: Column, capacity: Int): Column =
    Bridge.column(FreqSketchAgg(Bridge.expression(c), capacity).toAggregateExpression())

  /** Jaro–Winkler similarity in [0, 1] (codegen'd; DuckDB-parity
    * semantics — see [[JaroWinkler]]). */
  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  /** Bloom-filter membership probe (codegen'd; see
    * [[BloomMightContain]] for put/probe symmetry and
    * [[graft.operators.BloomJoin]] for the join patterns). */
  def might_contain_bloom(c: Column,
      bloom: org.apache.spark.util.sketch.BloomFilter): Column = {
    val bytes = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bytes)
    Bridge.column(BloomMightContain(Bridge.expression(c), bytes.toByteArray))
  }

  /** Morton/Z-order key: interleave the low `bits` bits of two
    * non-negative longs (a's bit i lands at 2i+1, b's at 2i), so
    * 1-D-range-partitioning the key tiles the (a, b) plane into
    * rectangles — 2-D data skipping from 1-D clustering (see
    * [[graft.sources.Warehouse.writeZOrdered]]). Composed from
    * builtin shift/mask ops — the whole key stays inside whole-stage
    * codegen without a custom expression. Callers normalize inputs to
    * [0, 2^bits) first; out-of-range bits are masked off here. */
  def interleave_bits(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    val one = lit(1L)
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(one), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(one), 2 * i))
    }.reduce(_ bitwiseOR _)
  }
}
