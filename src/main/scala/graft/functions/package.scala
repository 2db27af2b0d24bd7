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

  // Morton/Z-order keys live in graft.operators.ZOrder (interleave2 /
  // interleaveN / zValueN) — the engine's single Morton
  // implementation, oracle-covered by q199/q200. The former
  // `interleave_bits` duplicate was removed in round 10.
}
