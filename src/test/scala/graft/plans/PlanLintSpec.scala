package graft.plans

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cartesian and nested-loop joins between UNBOUNDED sides are flagged") {
    // file-backed sides: a LocalTableScan or scalar-agg side is the
    // legitimate scalar-broadcast pattern and must NOT flag
    val a = TestSpark.table("orders").select($"o_orderkey".as("x"))
    val b = TestSpark.table("lineitem").select($"l_orderkey".as("y"))
    val theta = PlanLint.check(a.join(b, $"x" < $"y"))
    assert(theta.exists(f => f.startsWith("NESTED_LOOP") ||
      f.startsWith("CARTESIAN")), theta.toString)
  }

  test("scalar-broadcast and probe-limit sides are NOT flagged") {
    val big = TestSpark.table("lineitem")
    val stats = big.agg(avg($"l_quantity").as("m"))
    assert(!PlanLint.check(big.crossJoin(stats))
      .exists(_.startsWith("NESTED_LOOP")))
    val probe = TestSpark.table("orders").limit(1)
      .select($"o_totalprice".as("p"))
    assert(!PlanLint.check(big.join(probe, $"l_extendedprice" < $"p"))
      .exists(_.startsWith("NESTED_LOOP")))
  }

  test("global window flagged; partitioned window clean") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("v", "g")
    val global = df.withColumn("rn",
      row_number().over(Window.orderBy($"v")))
    assert(PlanLint.check(global).exists(_.startsWith("GLOBAL_WINDOW")))
    val part = df.withColumn("rn",
      row_number().over(Window.partitionBy($"g").orderBy($"v")))
    assert(!PlanLint.check(part).exists(_.startsWith("GLOBAL_WINDOW")))
  }

  test("unpushed scan filter flagged; pushable filter clean") {
    val lint = PlanLint.check(TestSpark.table("orders")
      // crc32 around the column defeats parquet pushdown
      .filter(crc32($"o_orderpriority".cast("binary")) === 123L))
    assert(lint.exists(_.startsWith("UNPUSHED_SCAN_FILTER")), lint.toString)
    val clean = PlanLint.check(TestSpark.table("orders")
      .filter($"o_totalprice" > 1000.0))
    assert(!clean.exists(_.startsWith("UNPUSHED_SCAN_FILTER")), clean.toString)
  }

  test("a healthy aggregate query produces no findings") {
    val q = TestSpark.table("lineitem")
      .groupBy($"l_returnflag").agg(sum($"l_quantity"))
    assert(PlanLint.check(q) === Seq.empty)
  }

  test("adviseSkew names a planted 90%-hot join key and suggests SaltedJoin") {
    // 90% of the big side lands on key 7; the dim side is uniform.
    // broadcastThreshold = -1 forces "both sides shuffle" so the
    // advisory path is exercised without mutating the shared session
    val big = spark.range(0, 20000)
      .select(when($"id" % 10 =!= 0, lit(7L)).otherwise($"id").as("k"),
        $"id".as("payload"))
    val dim = spark.range(0, 100).select($"id".as("k"), $"id".as("attr"))
    val findings = PlanLint.adviseSkew(big.join(dim, Seq("k")),
      hotShare = 0.3, minRows = 1000, broadcastThreshold = Some(-1L))
    assert(findings.size === 1, findings.toString)
    val f = findings.head
    assert(f.startsWith("SKEWED_JOIN_KEY"), f)
    assert(f.contains("(k)") && f.contains("left side"), f)
    assert(f.contains("value 7 owns 90.0%"), f)
    assert(f.contains("SaltedJoin.join"), f)
    // the suggested rewrite really does balance: same rows out
    val salted = graft.operators.SaltedJoin.join(big, dim, Seq("k"), 8)
    assert(salted.count() === big.join(dim, Seq("k")).count())
  }

  test("adviseSkew: uniform keys and broadcast-size dims stay silent") {
    val big = spark.range(0, 20000)
      .select(($"id" % 500).as("k"), $"id".as("payload"))
    val dim = spark.range(0, 500).select($"id".as("k"), $"id".as("attr"))
    // uniform keys: no finding even with broadcast disabled
    assert(PlanLint.adviseSkew(big.join(dim, Seq("k")),
      hotShare = 0.3, minRows = 1000,
      broadcastThreshold = Some(-1L)) === Seq.empty)
    // skewed but the dim side broadcasts: no shuffle, no finding —
    // and the skewed BIG side is also skipped when IT broadcasts
    val hot = spark.range(0, 20000)
      .select(when($"id" % 10 =!= 0, lit(7L)).otherwise($"id").as("k"))
    assert(PlanLint.adviseSkew(hot.join(dim, Seq("k")),
      hotShare = 0.3, minRows = 1000,
      broadcastThreshold = Some(Long.MaxValue)) === Seq.empty)
  }
}
