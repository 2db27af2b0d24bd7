package graft.olap

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drill-across: conformed full-outer semantics, derived measures,
  * navigator routing (zero fact bytes when covered), and the
  * measure-name disjointness contract. */
class DrillAcrossSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two tiny facts over a conformed (region, period) grain; period 1
  // exists only in arrivals, period 3 only in departures
  private lazy val arrivals = Seq(
    ("north", 1, 10.0), ("north", 2, 20.0), ("south", 2, 5.0))
    .toDF("region", "period", "amt")
  private lazy val departures = Seq(
    ("north", 2, 8.0), ("south", 3, 4.0), ("south", 2, 1.0))
    .toDF("region", "period", "amt")

  private def net = (coalesce(col("a_sum"), lit(0.0)) -
    coalesce(col("d_sum"), lit(0.0))).as("net")

  test("full-outer conformed merge: one-sided members survive with null other-side measures") {
    val got = DrillAcross.drillAcross(
      arrivals, Seq(sum(col("amt")).as("a_sum")),
      departures, Seq(sum(col("amt")).as("d_sum")),
      on = Seq("region", "period"), derived = Seq(net))
      .orderBy("region", "period").collect()
    val byKey = got.map(r => (r.getString(0), r.getInt(1)) ->
      (Option(r.get(2)), Option(r.get(3)), r.getDouble(4))).toMap
    assert(byKey.keySet === Set(("north", 1), ("north", 2),
      ("south", 2), ("south", 3)))
    // arrivals-only member: departures measures null, net = arrivals
    assert(byKey(("north", 1)) === ((Some(10.0), None, 10.0)))
    // departures-only member: arrivals null, net negative
    assert(byKey(("south", 3)) === ((None, Some(4.0), -4.0)))
    // both sides: net is the difference
    assert(byKey(("north", 2)) === ((Some(20.0), Some(8.0), 12.0)))
    assert(byKey(("south", 2)) === ((Some(5.0), Some(1.0), 4.0)))
  }

  test("navigated drill-across ≡ direct, and a covered drill never constructs either fact lineage") {
    val root = java.nio.file.Files.createTempDirectory("dax_nav").toString
    try {
      arrivals.write.parquet(s"$root/fa")
      departures.write.parquet(s"$root/fb")
      var builtA = 0; var builtB = 0
      def fa = { builtA += 1; spark.read.parquet(s"$root/fa") }
      def fb = { builtB += 1; spark.read.parquet(s"$root/fb") }
      val measuresA = Seq[AggNavigator.Measure](
        AggNavigator.CountAll("a_cnt"), AggNavigator.ExactSum("a_sum", "amt"))
      val measuresB = Seq[AggNavigator.Measure](
        AggNavigator.CountAll("d_cnt"), AggNavigator.ExactSum("d_sum", "amt"))
      val regA = AggNavigator.register(spark.read.parquet(s"$root/fa"),
        Seq("rp" -> Seq("region", "period")), measuresA, s"$root/aggA")
      val regB = AggNavigator.register(spark.read.parquet(s"$root/fb"),
        Seq("rp" -> Seq("region", "period")), measuresB, s"$root/aggB")
      for (on <- Seq(Seq("region"), Seq("region", "period"), Seq("period"))) {
        val routed = DrillAcross.navigated(regA, fa, regB, fb, on, Seq(net))
        // covered drills read ONLY the agg parquet — no fact files in
        // the scanned plan, and the by-name fact was never even built
        val scanned = routed.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            r.relation match {
              case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                h.location.rootPaths.map(_.toString)
              case _ => Nil
            }
        }.flatten
        assert(scanned.forall(p => p.contains("aggA") || p.contains("aggB")),
          s"drill $on read beyond the agg tables: $scanned")
        def dsum(c: org.apache.spark.sql.Column) =
          sum(c.cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double")
        val direct = DrillAcross.drillAcross(
          spark.read.parquet(s"$root/fa"),
          Seq(count(lit(1)).as("a_cnt"), dsum(col("amt")).as("a_sum")),
          spark.read.parquet(s"$root/fb"),
          Seq(count(lit(1)).as("d_cnt"), dsum(col("amt")).as("d_sum")),
          on, Seq(net))
        val key = (r: org.apache.spark.sql.Row) =>
          on.indices.map(r.get).mkString("|")
        assert(routed.collect().map(r => key(r) -> r.toSeq.drop(on.size)).toMap
          === direct.collect().map(r => key(r) -> r.toSeq.drop(on.size)).toMap,
          s"navigated drill $on diverged from the direct drill-across")
      }
      assert(builtA === 0 && builtB === 0,
        "covered drills must not construct the fact lineage")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("N-way drill-across: members from ANY side survive the chained conformed merge") {
    val returns = Seq(("south", 3, 2.0), ("east", 4, 9.0))
      .toDF("region", "period", "amt")
    val got = DrillAcross.drillAcrossAll(Seq(
      arrivals -> Seq(sum(col("amt")).as("a_sum")),
      departures -> Seq(sum(col("amt")).as("d_sum")),
      returns -> Seq(sum(col("amt")).as("r_sum"))),
      on = Seq("region", "period"),
      derived = Seq((coalesce(col("a_sum"), lit(0.0)) -
        coalesce(col("d_sum"), lit(0.0)) +
        coalesce(col("r_sum"), lit(0.0))).as("net")))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (Option(r.get(2)), Option(r.get(3)), Option(r.get(4)),
          r.getDouble(5))).toMap
    // ("east", 4) exists ONLY in the third fact — a member introduced
    // by the last side of the fold must keep its coalesced keys
    assert(got.keySet === Set(("north", 1), ("north", 2), ("south", 2),
      ("south", 3), ("east", 4)))
    assert(got(("east", 4)) === ((None, None, Some(9.0), 9.0)))
    // a member spanning sides 2 and 3 but not 1
    assert(got(("south", 3)) === ((None, Some(4.0), Some(2.0), -2.0)))
    // and the three-way derived composes all sides
    assert(got(("north", 2)) === ((Some(20.0), Some(8.0), None, 12.0)))
  }

  test("navigatedAll: three cube sides route with zero fact lineage and match the direct N-way merge") {
    val root = java.nio.file.Files.createTempDirectory("dax_nav3").toString
    try {
      val returns = Seq(("south", 3, 2.0), ("east", 4, 9.0))
        .toDF("region", "period", "amt")
      val frames = Seq("fa" -> arrivals, "fb" -> departures, "fc" -> returns)
      frames.foreach { case (n, df) => df.write.parquet(s"$root/$n") }
      var built = 0
      val sides = frames.zip(Seq("a", "d", "r")).map { case ((n, _), p) =>
        val reg = AggNavigator.register(spark.read.parquet(s"$root/$n"),
          Seq("rp" -> Seq("region", "period")),
          Seq[AggNavigator.Measure](AggNavigator.ExactSum(s"${p}_sum", "amt")),
          s"$root/agg_$n")
        reg -> (() => { built += 1; spark.read.parquet(s"$root/$n") })
      }
      val got = DrillAcross.navigatedAll(sides, Seq("region", "period"))
        .collect().map(r => (r.getString(0), r.getInt(1)) ->
          (Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
      assert(built === 0, "covered drills must not construct any fact lineage")
      assert(got(("east", 4)) === ((None, None, Some(9.0))))
      assert(got(("north", 2)) === ((Some(20.0), Some(8.0), None)))
      val direct = DrillAcross.drillAcrossAll(
        frames.zip(Seq("a", "d", "r")).map { case ((_, df), p) =>
          df -> Seq(sum(col("amt").cast(
            org.apache.spark.sql.types.DecimalType(18, 2))).cast("double")
            .as(s"${p}_sum"))
        }, Seq("region", "period"))
        .collect().map(r => (r.getString(0), r.getInt(1)) ->
          (Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
      assert(got === direct)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("clashing measure aliases across fact sides are rejected with the contract named") {
    val e = intercept[IllegalArgumentException] {
      DrillAcross.drillAcrossAll(Seq(
        arrivals -> Seq(sum(col("amt")).as("s")),
        departures -> Seq(sum(col("amt")).as("s"))), Seq("region"))
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("clashing measure names across the two registries are rejected") {
    val root = java.nio.file.Files.createTempDirectory("dax_clash").toString
    try {
      arrivals.write.parquet(s"$root/fa")
      val m = Seq[AggNavigator.Measure](AggNavigator.CountAll("cnt"))
      val reg = AggNavigator.register(spark.read.parquet(s"$root/fa"),
        Seq("r" -> Seq("region")), m, s"$root/agg")
      val e = intercept[IllegalArgumentException] {
        DrillAcross.navigated(reg, arrivals, reg, departures, Seq("region"))
      }
      assert(e.getMessage.contains("disjoint"))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
