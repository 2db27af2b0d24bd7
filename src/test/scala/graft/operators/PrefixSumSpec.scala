package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // small enough that the single-partition window oracle is fine
  private lazy val longs = (1L to 500L).map(i => (i * 3L, i % 7L + 1L))
    .toDF("ord", "v")

  private def oracle(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.withColumn("cs", sum($"v").over(Window.orderBy($"ord")))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  private def got(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("driver path matches the global-window oracle") {
    val out = PrefixSum.cumsum(longs, "ord", "v", "cs", bucketWidth = 10)
    assert(got(out) === oracle(longs))
  }

  test("distributed two-level fallback matches the oracle (bucketWidth=1)") {
    // bucketWidth=1 → 500 buckets; cap of 7 forces the fallback with
    // ~72 superbuckets folded down; results must hash-match exactly
    val out = PrefixSum.cumsum(longs, "ord", "v", "cs",
      bucketWidth = 1, maxDriverBuckets = 7)
    assert(got(out) === oracle(longs))
  }

  test("fallback ≡ driver path on fractional values") {
    val dbl = longs.select($"ord", ($"v" / 4.0).as("v"))
    val drv = PrefixSum.cumsum(dbl, "ord", "v", "cs", bucketWidth = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val fb = PrefixSum.cumsum(dbl, "ord", "v", "cs",
        bucketWidth = 1, maxDriverBuckets = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(fb.keySet === drv.keySet)
    fb.foreach { case (k, x) => assert(math.abs(x - drv(k)) < 1e-9, s"ord=$k") }
  }

  test("both offset paths fail loudly on Long overflow, never wrap") {
    // values near Long.MaxValue: the running offset overflows by the
    // second bucket. Driver path = Math.addExact; distributed path =
    // DECIMAL(38,0) accumulation + checked cast — both must THROW, not
    // wrap silently (the pre-round-5 distributed path wrapped)
    val big = Seq((1L, Long.MaxValue / 2), (100001L, Long.MaxValue / 2),
      (200001L, Long.MaxValue / 2), (300001L, 1L)).toDF("ord", "v")
    val eDrv = intercept[Exception] {
      PrefixSum.cumsum(big, "ord", "v", "cs", bucketWidth = 100000L).collect()
    }
    assert((eDrv.getMessage + eDrv.toString).toLowerCase.contains("overflow"),
      eDrv.toString)
    val eDist = intercept[Exception] {
      PrefixSum.cumsum(big, "ord", "v", "cs", bucketWidth = 100000L,
        maxDriverBuckets = 2).collect()
    }
    assert(eDist.getMessage.contains("overflows Long") ||
      Option(eDist.getCause).exists(_.getMessage.contains("overflows Long")),
      eDist.toString)
  }

  test("packBudget under the fallback cap still packs greedily") {
    val docs = (1L to 100L).map(i => (i, 10L)).toDF("ord", "tok")
    val packs = PrefixSum.packBudget(docs, "ord", "tok", budget = 35L,
        bucketWidth = 100000L)
      .groupBy($"pack_id").agg(sum($"tok").as("t"), count(lit(1)).as("n"))
      .collect()
    // greedy contract: every pack except possibly the last holds ≥ budget
    // once its overflow doc lands, and none exceeds budget+maxDoc
    packs.foreach { r =>
      assert(r.getLong(1) <= 35L + 10L, s"pack ${r.getLong(0)} too full")
    }
    assert(packs.map(_.getLong(2)).sum === 100L)
  }
}
