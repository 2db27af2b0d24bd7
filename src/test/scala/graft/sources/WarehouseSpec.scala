package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cached: builds on miss, serves parquet on hit, rebuilds on force") {
    val tmp = java.nio.file.Files.createTempDirectory("cache").toString + "/wide"
    var builds = 0
    def build = { builds += 1; TestSpark.table("nation") }
    val first = Warehouse.cached(spark, tmp)(build)
    assert(builds === 1 && first.count() === 25)
    val second = Warehouse.cached(spark, tmp)(build)
    assert(builds === 1, "hit must not rebuild")
    assert(second.count() === 25)
    Warehouse.cached(spark, tmp, forceReload = true)(build)
    assert(builds === 2, "forceReload must rebuild")
  }

  test("same-bucketed tables join with no shuffle exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("wh").toString
    Warehouse.writeBucketed(TestSpark.table("orders"),
      "b_orders", s"$tmp/b_orders", "o_custkey", 8)
    Warehouse.writeBucketed(
      TestSpark.table("customer").select("c_custkey", "c_mktsegment"),
      "b_customer", s"$tmp/b_customer", "c_custkey", 8)
    // force the shuffle-join path: broadcast would hide the bucketing
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = Warehouse.colocatedJoin(spark, "b_orders", "b_customer",
        "o_custkey", "c_custkey")
      assert(!Warehouse.hasShuffle(j),
        s"expected exchange-free plan:\n${j.queryExecution.executedPlan}")
      // and it still computes the right thing
      val n = j.count()
      val expected = TestSpark.table("orders").join(
        TestSpark.table("customer"),
        col("o_custkey") === col("c_custkey")).count()
      assert(n === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
