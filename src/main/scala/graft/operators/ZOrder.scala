package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) multi-dimensional clustering — the layout
  * operator behind "OPTIMIZE ZORDER BY": rows close in SEVERAL key
  * dimensions land close in ONE linear order, so file/page min-max
  * statistics prune scans filtered on any of the dimensions, not just
  * the leading sort key. A lexicographic sort on (a, b) prunes `a`
  * predicates perfectly and `b` predicates not at all; the z-curve
  * splits the difference — every file covers a small RECTANGLE of
  * (a, b) space (see `zBucketStats`, which makes those rectangles
  * visible and oracle-checkable).
  *
  * All arithmetic is exact BIGINT (min-max normalize by integer
  * division, bit-spread by shift/mask), so the order is reproducible
  * in any engine — no doubles anywhere.
  *
  * Scale: `cluster` is ONE range exchange on the z-value plus a
  * partition-local sort — the same bill as any global sort — and the
  * normalization bounds come from one aggregate-only pass (or the
  * caller's known domain). At 100 TB the payoff is read-side: a scan
  * with a predicate on either dimension skips the files whose z-range
  * rectangle misses it.
  */
object ZOrder {

  /** Bit-spread a 16-bit value onto the even bit positions of 32
    * (the classic mask ladder). Exact on BIGINT columns. */
  private def spread16(c: Column): Column = {
    val a = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two 16-bit normalized coordinates: x on the
    * even bits, y on the odd bits → a 32-bit z-value. */
  def interleave2(x16: Column, y16: Column): Column =
    spread16(x16).bitwiseOR(shiftleft(spread16(y16), 1))

  /** Min-max normalize an integer column onto [0, 2^16): exact
    * integer division `((v − min) · 2^16) div (max − min + 1)` — the
    * max lands at 65535, never 65536, and every engine's integer
    * division agrees bit-for-bit (no doubles).
    *
    * PRECONDITION: `max − min < 2^47`, so `(v − min) << 16` fits a
    * BIGINT. Callers with data-derived bounds should use
    * [[zValue2]]/[[zValueN]], which check the span and switch to a
    * pre-shifted form for wide domains instead of wrapping silently
    * under non-ANSI arithmetic. */
  def normalize16(v: Column, minV: Column, maxV: Column): Column =
    call_function("div",
      shiftleft((v - minV).cast("long"), 16),
      (maxV - minV + lit(1)).cast("long"))

  /** `max − min` may reach up to this many bits before `(v − min) <<
    * 16` stops fitting a BIGINT (63 data bits − 16 shifted bits). */
  private val MaxExactSpanBits = 47

  /** [[normalize16]] with DRIVER-KNOWN bounds and an overflow-proof
    * wide-range regime. Spans under 2^47 use the exact formula
    * bit-for-bit (so existing oracles replaying the ladder in SQL are
    * unchanged); wider spans — epoch-micros timestamps spanning
    * years, sparse ids — are first arithmetic-shifted right by
    * `s = bitLength(span) − 46` (`v >> s` as a column, `min >> s` and
    * `span >> s` computed exactly on the driver in BigInt), which
    * keeps every intermediate inside a BIGINT at the cost of
    * quantization the 16-bit grid below cannot see anyway. The shift
    * targets 46 bits, one below the exact regime's 47: the shifted
    * coordinate `(v >> s) − (min >> s)` can exceed the shifted span
    * by 1 (floor-shift carry), so `(span >> s) + 1` must itself stay
    * under 2^47 for the `<< 16` to fit — shifting to exactly 47 bits
    * would wrap on that carry at the very top of the domain.
    * Monotone in `v` in both regimes; never wraps. */
  private def normalizeBounded(v: Column, minL: Long, maxL: Long): Column = {
    require(maxL >= minL, s"z-order bounds inverted: min=$minL max=$maxL")
    val span = BigInt(maxL) - BigInt(minL)
    if (span.bitLength <= MaxExactSpanBits)
      normalize16(v, lit(minL), lit(maxL))
    else {
      val s = span.bitLength - (MaxExactSpanBits - 1)
      // (v >> s) − (min >> s) ∈ [0, (span >> s) + 1]: at most one off
      // the exact (v − min) >> s, so the divisor gets +2 headroom to
      // keep the result strictly under 2^16, and the +1 carry keeps
      // the numerator under 2^46 + 1 — shifted left 16 that is
      // ≤ 2^62, never wrapping. All driver-side values exact via
      // BigInt; the column side only ever shifts right.
      val shiftedMin = BigInt(minL) >> s
      val divisor = ((span >> s) + 2).toLong
      call_function("div",
        shiftleft(shiftright(v.cast("long"), s) - lit(shiftedMin.toLong), 16),
        lit(divisor))
    }
  }

  /** Bridge from an aggregate row bound to a Long — INTEGRAL types
    * only. Fractional bounds must fail, not truncate: a Double key in
    * [0, 1) would silently normalize every row to cell 0 and the
    * dimension would contribute nothing to the layout. Callers with
    * fractional keys should derive an integral surrogate (scaled
    * long, epoch int) explicitly. */
  private def boundAsLong(v: Any, what: String): Long = v match {
    case null => throw new IllegalArgumentException(
      s"z-order $what bound is NULL: the dimension is empty or all-NULL")
    case n: java.lang.Byte => n.longValue()
    case n: java.lang.Short => n.longValue()
    case n: java.lang.Integer => n.longValue()
    case n: java.lang.Long => n.longValue()
    case n: java.math.BigDecimal if n.stripTrailingZeros.scale <= 0 =>
      n.longValueExact()
    case other => throw new IllegalArgumentException(
      s"z-order dimensions must be integral, got $what = $other " +
        s"(${other.getClass.getName}); derive an integral surrogate " +
        "(scaled long, epoch int) for fractional keys")
  }

  /** Morton interleave of k 16-bit normalized coordinates: dimension
    * i owns bit positions b·k + i — the general bit-by-bit build
    * (16·k OR-terms, all inside whole-stage codegen). For k = 2 it
    * equals [[interleave2]]'s mask-ladder bit-for-bit (spec-pinned);
    * the ladder stays as the documented fast form. */
  def interleaveN(dims16: Seq[Column]): Column = {
    require(dims16.nonEmpty, "interleaveN needs at least one dimension")
    val k = dims16.length
    require(16L * k <= 62, s"interleaveN supports up to 3 dimensions of 16 bits, got $k")
    val terms = for {
      b <- 0 until 16
      (d, i) <- dims16.zipWithIndex
    } yield shiftleft(shiftright(d, b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The z-value of two integer dimensions with data-derived bounds
    * (one aggregate-only pass — the bounded-probe pattern). */
  def zValue2(df: DataFrame, xCol: String, yCol: String): Column = {
    val r = df.agg(count(lit(1)), min(col(xCol)), max(col(xCol)),
      min(col(yCol)), max(col(yCol))).head()
    if (r.getLong(0) == 0L)
      // empty input: no row ever evaluates the expression, so the
      // null-propagating form is fine (and cluster of an empty frame
      // stays legal)
      interleave2(
        normalize16(col(xCol), lit(r.get(1)), lit(r.get(2))),
        normalize16(col(yCol), lit(r.get(3)), lit(r.get(4))))
    // non-empty: an all-NULL dimension has no usable bounds and would
    // silently zero the layout — boundAsLong fails loudly on it
    else interleave2(
      normalizeBounded(col(xCol), boundAsLong(r.get(1), s"min($xCol)"),
        boundAsLong(r.get(2), s"max($xCol)")),
      normalizeBounded(col(yCol), boundAsLong(r.get(3), s"min($yCol)"),
        boundAsLong(r.get(4), s"max($yCol)")))
  }

  /** The z-value of k integer dimensions (k ≤ 3) with data-derived
    * bounds — one aggregate-only pass for all 2k extrema. */
  def zValueN(df: DataFrame, cols: Seq[String]): Column = {
    val aggs = count(lit(1)) +: cols.flatMap(c =>
      Seq(min(col(c)), max(col(c))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    if (r.getLong(0) == 0L) // empty input — see zValue2
      interleaveN(cols.zipWithIndex.map { case (c, i) =>
        normalize16(col(c), lit(r.get(2 * i + 1)), lit(r.get(2 * i + 2)))
      })
    else interleaveN(cols.zipWithIndex.map { case (c, i) =>
      normalizeBounded(col(c), boundAsLong(r.get(2 * i + 1), s"min($c)"),
        boundAsLong(r.get(2 * i + 2), s"max($c)"))
    })
  }

  /** Cluster the frame along the z-curve: one range exchange on the
    * z-value + a partition-local sort, so each output partition (→
    * parquet file) covers a contiguous z-range = a small rectangle of
    * (x, y) space. Write the result as-is; the pruning is then free
    * at read time. */
  def cluster(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int): DataFrame = {
    require(!df.columns.contains("__z"),
      "ZOrder.cluster reserves the internal column name __z")
    df.withColumn("__z", zValue2(df, xCol, yCol))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Per-bucket bounding boxes over `buckets` equal z-ranges — the
    * clustering QUALITY made visible (and oracle-checkable: bucket
    * assignment is pure integer arithmetic): each bucket's (x, y)
    * min/max is the rectangle a file covering that z-range would
    * declare in its min-max stats. Sum of rectangle areas ≈ expected
    * scan amplification; z-order keeps it near the data's own area,
    * a linear order multiplies it by the unsorted dimension's full
    * range (ZOrderSpec quantifies exactly that). */
  def zBucketStats(df: DataFrame, xCol: String, yCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 20),
      s"buckets must be in [1, 2^20], got $buckets")
    df.withColumn("__z", zValue2(df, xCol, yCol))
      .select(
        call_function("div", col("__z") * lit(buckets.toLong),
          lit(1L << 32)).as("bucket"),
        col(xCol), col(yCol))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))
  }

  /** [[zBucketStats]] for k dimensions (k ≤ 3): per-bucket counts and
    * each dimension's `<col>_min`/`<col>_max` — the k-dimensional
    * bounding BOX a z-clustered file's stats would declare. */
  def zBucketStatsN(df: DataFrame, cols: Seq[String],
      buckets: Int): DataFrame = {
    val zSpan = 1L << (16 * cols.length)
    // z < zSpan, so the bucket arithmetic computes z·buckets — cap
    // buckets where that product stays inside a Long (2-D: ≤ 2^20
    // as before; 3-D: ≤ 2^14). An uncapped 3-D call with 2^20
    // buckets would WRAP under non-ANSI semantics: garbage bucket
    // ids, silently.
    val maxBuckets = math.min(1L << 20, Long.MaxValue / zSpan)
    require(buckets >= 1 && buckets <= maxBuckets,
      s"buckets must be in [1, $maxBuckets] for ${cols.length} dims, got $buckets")
    val aggs = count(lit(1)).as("n") +: cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.withColumn("__z", zValueN(df, cols))
      .select((call_function("div", col("__z") * lit(buckets.toLong),
        lit(zSpan)).as("bucket") +: cols.map(col)): _*)
      .groupBy(col("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
