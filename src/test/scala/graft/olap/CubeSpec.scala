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

  private val incrHs = Seq(Cube.Hierarchy("fecha", Seq("y", "m")),
    Cube.Hierarchy("status", Seq("o_orderstatus")))
  private val incrGroupCols = Seq("y", "m", "o_orderstatus")

  private def incrPartials(df: org.apache.spark.sql.DataFrame) =
    Cube.memberSets(df, incrHs,
      Seq(count(lit(1)).as("cnt"),
        sum($"o_totalprice".cast("decimal(18,2)")).as("s")))

  private val incrMergeAggs = Seq(sum($"cnt").as("cnt"), sum($"s").as("s"))

  private def memberMap(df: org.apache.spark.sql.DataFrame) =
    df.select("y", "m", "o_orderstatus", "gid", "cnt", "s")
      .collect()
      .map(r => ((r.get(0), r.get(1), r.get(2), r.getLong(3)),
        (r.getLong(4), Option(r.getDecimal(5)).map(_.toPlainString))))
      .toMap

  test("mergeMemberSets: base ⊕ delta equals the full recompute, " +
      "data-NULL levels never collide with rolled-up NULLs") {
    // a genuinely NULL level value must stay a distinct member from
    // the same-position rolled-up NULL — the gid in the merge key is
    // what keeps them apart
    val facts = orders.withColumn("o_orderstatus",
      when($"m" % 4 === 0, lit(null: String)).otherwise($"o_orderstatus"))
    val base = facts.filter($"y" < 1996)
    val delta = facts.filter($"y" >= 1996)
    val merged = Cube.mergeMemberSets(
      Seq(incrPartials(base), incrPartials(delta)),
      incrGroupCols, incrMergeAggs)
    val full = incrPartials(facts)
    val got = memberMap(merged)
    val want = memberMap(full)
    assert(got === want)
    // vacuity guards: both halves are non-trivial, and the NULL-status
    // data member exists at a leaf gid alongside rolled-up rows
    assert(base.count() > 0 && delta.count() > 0)
    assert(want.keys.exists { case (_, _, st, gid) =>
      st == null && gid == 1L }) // (y, m) set: status bit rolled
    assert(want.keys.exists { case (_, _, st, gid) =>
      st == null && gid == 6L }) // (status) set: genuine NULL member
  }

  test("foreachBatch cube maintenance: merged state after the stream " +
      "equals the full recompute") {
    // the served-cube lifecycle: facts arrive as files, each
    // micro-batch contributes member partials, the sink merges them
    // into the state relation — the fact table is never rescanned
    val base = java.nio.file.Files.createTempDirectory("cube_maint")
      .toString
    val src = s"$base/src"
    // three single-file waves → maxFilesPerTrigger=1 yields three
    // genuine merge steps
    (0 until 3).foreach(i => orders.filter($"y" % 3 === i)
      .coalesce(1).write.mode("append").parquet(src))
    var stateDir: Option[String] = None
    val q = spark.readStream.schema(orders.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val merged = stateDir match {
          case None => incrPartials(batch)
          case Some(d) => Cube.mergeMemberSets(
            Seq(spark.read.parquet(d), incrPartials(batch)),
            incrGroupCols, incrMergeAggs)
        }
        val out = s"$base/state_v$id"
        merged.write.mode("overwrite").parquet(out)
        stateDir = Some(out)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "maintenance stream timed out")
    assert(stateDir.isDefined)
    val got = memberMap(spark.read.parquet(stateDir.get))
    val want = memberMap(incrPartials(orders))
    assert(got === want)
    assert(want.size > 10)
  }

  test("member space written partitioned by gid serves each drill " +
      "partition-pruned") {
    // the serving layout: q203/q207's member space lands partitioned
    // by grouping-set id, so an MDX-style drill (one gid slice) reads
    // ONE partition directory — at a 100 TB cube the serving store is
    // member-sized and a drill touches member-count/gids rows, never
    // the fact table and never the other drills' members
    val dir = java.nio.file.Files.createTempDirectory("cube_serve")
      .toString
    incrPartials(orders).write.partitionBy("gid")
      .mode("overwrite").parquet(dir)
    val served = spark.read.parquet(dir).filter(col("gid") === 3)
    val got = served.select("y", "m", "o_orderstatus", "cnt")
      .collect().map(_.toSeq).toSet
    val want = incrPartials(orders).filter(col("gid") === 3)
      .select("y", "m", "o_orderstatus", "cnt")
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters: [") && l.contains("gid")),
      s"no gid partition pruning:\n$plan")
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
