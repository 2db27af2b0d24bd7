package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: exact bit math, normalization bounds, partition
  * rectangles, and the quantified pruning win over a linear order. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side Morton reference. */
  private def mortonRef(x: Long, y: Long): Long = {
    def spread(v0: Long): Long = {
      var v = v0
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    spread(x) | (spread(y) << 1)
  }

  test("interleave2 equals the bit-by-bit Morton reference") {
    val cases = Seq((0L, 0L), (5L, 3L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L), (1L, 2L))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleave2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y), s"($x, $y)")
    }
    assert(mortonRef(5L, 3L) === 27L) // hand-checked anchor
  }

  test("normalize16 maps [min, max] into [0, 65535], min to 0") {
    val df = Seq(10L, 11L, 500L, 1000L).toDF("v")
    val ns = df.select(ZOrder.normalize16(col("v"), lit(10L), lit(1000L))
      .as("n")).collect().map(_.getLong(0))
    assert(ns.head === 0L)
    assert(ns.forall(n => n >= 0L && n <= 65535L))
    assert(ns.last === (990L * 65536L) / 991L)
  }

  test("z buckets beat a linear order: bounding-box area sum on a grid") {
    // 64×64 grid: z-order buckets are near-square rectangles; bucketing
    // the same rows by x-major linear position makes every bucket span
    // the FULL y range. Area sum ratio quantifies the pruning win.
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    def areaSum(stats: Array[org.apache.spark.sql.Row]): Long =
      stats.map(r => (r.getAs[Long]("x_max") - r.getAs[Long]("x_min") + 1) *
        (r.getAs[Long]("y_max") - r.getAs[Long]("y_min") + 1)).sum
    val zArea = areaSum(ZOrder.zBucketStats(grid, "x", "y", 16).collect())
    // linear comparator: same bucket COUNT over x-major rank
    val linear = grid.select(
        (((col("x") * 64 + col("y")) * 16) / lit(4096)).cast("long").as("bucket"),
        col("x"), col("y"))
      .groupBy("bucket")
      .agg(min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
      .collect()
    val linArea = areaSum(linear)
    // 16 z buckets tile the 64×64 square exactly: area sum = 4096;
    // x-major buckets each span y fully: 16 × (4 × 64) = 4096 too —
    // equal HERE because x-major is also contiguous. The real contrast:
    // bucket by y-then-x predicate pruning. Assert the z tiling is
    // PERFECT (disjoint rectangles covering every cell exactly once).
    assert(zArea === 4096L)
    assert(linArea === 4096L)
    val zStats = ZOrder.zBucketStats(grid, "x", "y", 16).collect()
    assert(zStats.map(_.getAs[Long]("n")).sum === 4096L)
    assert(zStats.forall(r => r.getAs[Long]("n") ===
      (r.getAs[Long]("x_max") - r.getAs[Long]("x_min") + 1) *
        (r.getAs[Long]("y_max") - r.getAs[Long]("y_min") + 1)),
      "every z bucket is a FULL rectangle — no holes, no spill")
    // and the rectangles are near-square (16×16 quadrants), while the
    // linear buckets are 4×64 slivers: a predicate y BETWEEN 0 AND 15
    // touches 4/16 z buckets but 16/16 linear buckets
    val zTouched = zStats.count(r =>
      r.getAs[Long]("y_min") <= 15L && r.getAs[Long]("y_max") >= 0L)
    val linTouched = linear.count(r =>
      r.getAs[Long]("y_min") <= 15L && r.getAs[Long]("y_max") >= 0L)
    assert(zTouched === 4, s"z buckets touched: $zTouched")
    assert(linTouched === 16, s"linear buckets touched: $linTouched")
  }

  test("interleaveN(k=2) equals the mask-ladder interleave2 bit-for-bit") {
    val cases = Seq((0L, 0L), (5L, 3L), (65535L, 65535L), (12345L, 54321L))
    val rows = cases.toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y")).as("a"),
        ZOrder.interleaveN(Seq(col("x"), col("y"))).as("b"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("interleaveN(k=3): dimension i owns bit positions 3b+i") {
    // x=1 (bit 0), y=1, q=1 → z = 0b111 = 7; x=2 (bit 1) alone → bit 3
    val got = Seq((1L, 1L, 1L), (2L, 0L, 0L), (0L, 2L, 0L), (0L, 0L, 2L))
      .toDF("x", "y", "q")
      .select(ZOrder.interleaveN(Seq(col("x"), col("y"), col("q"))).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(7L, 8L, 16L, 32L))
  }

  test("written z-clustered parquet: a one-dimension predicate touches few files") {
    // the end-to-end layout claim, against REAL files: write the grid
    // z-clustered into 16 files and x-major into 16 files; the rows
    // matching y <= 15 live in 4 of the z files but ALL 16 x-major
    // files — the file set a min-max-stats pruner would have to scan
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder_files")
    try {
      ZOrder.cluster(grid, "x", "y", 16)
        .write.mode("overwrite").parquet(s"$dir/z")
      grid.repartitionByRange(16, col("x") * 64 + col("y"))
        .write.mode("overwrite").parquet(s"$dir/linear")
      def filesTouched(path: String): Long =
        spark.read.parquet(path).filter(col("y") <= 15)
          .select(input_file_name()).distinct().count()
      assert(filesTouched(s"$dir/z") === 4L)
      assert(filesTouched(s"$dir/linear") === 16L)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("wide-span dimensions (>= 2^47) never wrap: epoch-micros z-values " +
      "stay in range and monotone") {
    // a timestamp dimension spanning ~36 years of epoch-MICROS
    // (span ≈ 2^60): the unguarded (v − min) << 16 would overflow a
    // BIGINT and wrap to garbage under non-ANSI semantics. The
    // pre-shift regime must keep every z-value inside [0, 2^32) and
    // preserve per-dimension monotonicity.
    val base = 1_100_000_000_000_000L // ~2004 in epoch micros
    val span = 1L << 60
    val ts = (0 until 64).map(i => base + (span / 64) * i)
    val df = ts.flatMap(t => Seq(0L, 500L).map(y => (t, y))).toDF("t", "y")
    val z = df.select(col("t"), col("y"),
      ZOrder.zValue2(df, "t", "y").as("z")).collect()
    z.foreach(r => assert(r.getLong(2) >= 0L && r.getLong(2) < (1L << 32),
      s"z out of 32-bit range for ${r.getLong(0)}"))
    // holding y fixed, z restricted to y's bucket is monotone in t at
    // the 16-bit grid (equal cells allowed, never decreasing order of
    // the normalized coordinate — extract t's even bits to compare)
    def evenBits(v: Long): Long =
      (0 until 16).map(b => ((v >> (2 * b)) & 1L) << b).sum
    val byY = z.filter(_.getLong(1) == 0L).sortBy(_.getLong(0))
      .map(r => evenBits(r.getLong(2)))
    byY.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, "normalized t must be monotone")
      case _ =>
    }
    // the full 16-bit grid is still used: max normalized cell is high
    assert(byY.last > 60000L, s"grid under-used: max cell ${byY.last}")
    // k = 3 with one wide dimension composes the same way
    val df3 = ts.take(16).flatMap(t =>
      Seq((t, 1L, 2L), (t, 3L, 4L))).toDF("t", "a", "b")
    val z3 = df3.select(ZOrder.zValueN(df3, Seq("t", "a", "b")).as("z"))
      .collect().map(_.getLong(0))
    assert(z3.forall(v => v >= 0L && v < (1L << 48)))
  }

  test("wide-span carry case: top-of-domain rows never wrap (span with " +
      "a floor-shift carry)") {
    // min = 1, max = 2^48: span = 2^48 − 1 (bitLength 48). Shifting to
    // 47 bits would leave (v >> s) − (min >> s) able to reach 2^47 at
    // the top of the domain, and << 16 would wrap a BIGINT; the
    // one-spare-bit shift (to 46) must keep every z-value valid.
    val xs = Seq(1L, 2L, (1L << 47) - 1, 1L << 47, (1L << 48) - 1, 1L << 48)
    val df = xs.map(x => (x, 0L)).toDF("x", "y")
    val z = df.select(col("x"), ZOrder.zValue2(df, "x", "y").as("z"))
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))
    z.foreach(v => assert(v >= 0L && v < (1L << 32), s"wrapped: $v"))
    z.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, "monotone in x (y fixed at 0)")
      case _ =>
    }
    assert(z.last > z.head, "domain must actually spread on the grid")
  }

  test("non-empty all-NULL dimension fails loudly; empty input stays legal") {
    val allNull = Seq((1L, null.asInstanceOf[java.lang.Long]),
      (2L, null.asInstanceOf[java.lang.Long])).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      ZOrder.zValue2(allNull, "x", "y")
    }
    assert(e.getMessage.contains("all-NULL"))
    // a fractional key must be rejected, not silently truncated to a
    // zero-contribution dimension
    val dbl = Seq((1L, 0.25), (2L, 0.75)).toDF("x", "y")
    val e2 = intercept[IllegalArgumentException] {
      ZOrder.zValue2(dbl, "x", "y")
    }
    assert(e2.getMessage.contains("integral"))
    // empty input: zValue2 and cluster remain callable (zero rows
    // evaluate the expression)
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(ZOrder.cluster(empty, "x", "y", 4).count() === 0L)
  }

  test("cluster: partitions carry disjoint z-ranges, sorted within") {
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val clustered = ZOrder.cluster(grid, "x", "y", 8)
    assert(clustered.columns.toSeq === Seq("x", "y"), "__z is internal")
    val ranges = clustered
      .withColumn("__z2", ZOrder.zValue2(grid, "x", "y"))
      .withColumn("__pid", spark_partition_id())
      .groupBy("__pid").agg(min("__z2").as("lo"), max("__z2").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        "partition z-ranges must not interleave")
      case _ =>
    }
  }
}
