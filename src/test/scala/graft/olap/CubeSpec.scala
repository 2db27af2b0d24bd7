package graft.olap

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CubeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val orders = TestSpark.table("orders")
    .select(year($"o_orderdate").as("y"), month($"o_orderdate").as("m"),
      $"o_totalprice", $"o_orderstatus")

  test("drillDown: leaf rows sum to subtotals, subtotals to grand total") {
    val h = Cube.Hierarchy("fecha", Seq("y", "m"))
    val out = Cube.drillDown(orders, h, Seq(count(lit(1)).as("n")), depth = 2)
    val leaves = out.filter($"level_mask" === 0)
      .agg(sum($"n")).head.getLong(0)
    val subtotals = out.filter($"level_mask" === 1)
      .agg(sum($"n")).head.getLong(0)
    val grand = out.filter($"level_mask" === 3).head.getAs[Long]("n")
    assert(leaves === grand)
    assert(subtotals === grand)
    assert(grand === orders.count())
  }

  test("slice equals plain groupBy") {
    val s = Cube.slice(orders, Seq("y"), Seq(count(lit(1)).as("n")))
      .orderBy("y").collect().map(r => (r.getInt(0), r.getLong(1)))
    val g = orders.groupBy("y").agg(count(lit(1)).as("n"))
      .orderBy("y").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(s.toSeq === g.toSeq)
  }

  test("slice with slicer filters first") {
    val s = Cube.slice(orders, Seq("y"), Seq(count(lit(1)).as("n")),
      slicers = Seq($"o_orderstatus" === "O"))
    val total = s.agg(sum($"n")).head.getLong(0)
    assert(total === orders.filter($"o_orderstatus" === "O").count())
  }

  test("cube2 contains all four grouping levels") {
    val out = Cube.cube2(orders, "y", "o_orderstatus", Seq(count(lit(1)).as("n")))
    assert(out.select("level_mask").distinct().count() === 4)
  }

  test("star schema wide table: broadcast joins, aliased dim columns") {
    val cust = TestSpark.table("customer")
    val nation = TestSpark.table("nation")
    val wide = StarSchema.wideTable(
      cust.withColumnRenamed("c_nationkey", "n_nationkey"),
      Seq(StarSchema.Dim(nation, "n_nationkey", "nat")))
    assert(wide.columns.contains("nat_n_name"))
    assert(wide.count() === cust.count())
    val plan = wide.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("memberSets: one pass equals every per-prefix slice, gid-keyed") {
    val hs = Seq(Cube.Hierarchy("fecha", Seq("y", "m")),
      Cube.Hierarchy("status", Seq("o_orderstatus")))
    val wide = orders.withColumn("src", lit("orders"))
    val outM = Cube.memberSets(wide, hs, Seq(count(lit(1)).as("n")),
      always = Seq("src")).persist()
    // gid bit order: (src, y, m, o_orderstatus), src grouped in every
    // set → MSB 0. All-member gid = 0b0111 = 7; (y) = 0b0011 = 3;
    // (y,m) = 0b0001 = 1; (o_orderstatus) = 0b0110 = 6.
    def slice(gid: Long, cols: String*) = {
      val got = outM.filter(col("gid") === gid)
        .select((Seq("src") ++ cols :+ "n").map(col): _*)
        .collect().map(_.toSeq).toSet
      val want = wide.groupBy((Seq("src") ++ cols).map(col): _*)
        .agg(count(lit(1)).as("n")).collect().map(_.toSeq).toSet
      assert(got === want, s"gid=$gid cols=$cols")
    }
    try {
      slice(3, "y")
      slice(1, "y", "m")
      slice(6, "o_orderstatus")
      assert(outM.filter(col("gid") === 7).count() === 1)
      assert(outM.filter(col("gid") === 7).head.getAs[Long]("n") ===
        orders.count())
      // exactly the prefix sets, nothing else (no full cube explosion)
      assert(outM.select("gid").distinct().collect().map(_.getLong(0))
        .toSet === Set(1L, 3L, 6L, 7L))
    } finally outM.unpersist()
  }
}
