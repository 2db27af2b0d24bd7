package graft.olap

import graft.TestSpark
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The declarative front door compiles onto the existing plans:
  * hash-identity with the direct calls, registry routing with zero
  * fact lineage, and loud rejection of unservable shapes. */
class CubeQuerySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val wide = TestSpark.table("orders")
    .select(col("o_orderstatus").as("status"),
      col("o_orderpriority").as("prio"),
      year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
      col("o_totalprice").as("price"))

  private val hier = Seq(
    Cube.Hierarchy("fecha", Seq("y", "m")),
    Cube.Hierarchy("estado", Seq("status")))

  private val measures = Seq(count(lit(1)).as("n"),
    sum(col("price").cast("decimal(18,2)")).cast("double").as("rev"))

  private def sortedRows(df: DataFrame) = TestSpark.sortedRows(df)

  test("member space through the front door ≡ Cube.memberSets, row for row") {
    val got = CubeQuery.run(CubeQuery.Query(
      cube = CubeQuery.CubeRef(() => wide, measures = measures),
      hierarchies = hier))
    val want = Cube.memberSets(wide, hier, measures)
    assert(sortedRows(got) === sortedRows(want))
  }

  test("slicers apply pre-aggregation on a direct cube") {
    val got = CubeQuery.run(CubeQuery.Query(
      cube = CubeQuery.CubeRef(() => wide, measures = measures),
      hierarchies = hier, slicers = Seq(col("y") >= 1996)))
    val want = Cube.memberSets(wide.filter(col("y") >= 1996), hier, measures)
    assert(sortedRows(got) === sortedRows(want))
  }

  test("a ROUTED cube serves COVERED slicers from stored partials — " +
      "zero fact lineage; uncovered slicers fall back to the fact") {
    val root = java.nio.file.Files.createTempDirectory("cq_sliced").toString
    try {
      wide.write.parquet(s"$root/fact")
      var built = 0
      def fact = { built += 1; spark.read.parquet(s"$root/fact") }
      val navMeasures = Seq[AggNavigator.Measure](
        AggNavigator.CountAll("n"), AggNavigator.ExactSum("rev", "price"))
      val reg = AggNavigator.register(spark.read.parquet(s"$root/fact"),
        Seq("ym" -> Seq("y", "m")), navMeasures, root)
      // covered: slicer on y, drill on (y, m) — the ym grain carries
      // both, so the filter commutes onto the stored partials
      val covered = CubeQuery.run(CubeQuery.Query(
        cube = CubeQuery.CubeRef(() => fact, registry = Some(reg)),
        grain = Seq("y", "m"), slicers = Seq(col("y") >= 1996)))
      val rows = sortedRows(covered)
      assert(built === 0,
        "a covered sliced drill must not construct the fact lineage")
      val want = wide.filter(col("y") >= 1996).groupBy("y", "m")
        .agg(count(lit(1)).as("n"),
          sum(col("price").cast("decimal(18,2)")).cast("double").as("rev"))
      assert(rows === sortedRows(want))
      // uncovered: slicer on status (no rollup carries it) — the
      // navigator's fact fallback answers, slicer pre-aggregation
      val uncovered = CubeQuery.run(CubeQuery.Query(
        cube = CubeQuery.CubeRef(() => fact, registry = Some(reg)),
        grain = Seq("y"), slicers = Seq(col("status") === "O")))
      val uncoveredRows = sortedRows(uncovered)
      assert(built > 0, "an uncovered slicer must reach the fact")
      val uncoveredWant = wide.filter(col("status") === "O").groupBy("y")
        .agg(count(lit(1)).as("n"),
          sum(col("price").cast("decimal(18,2)")).cast("double").as("rev"))
      assert(uncoveredRows === sortedRows(uncoveredWant))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("a ROUTED member space serves from the registry with zero fact lineage") {
    val root = java.nio.file.Files.createTempDirectory("cq_routed").toString
    try {
      wide.write.parquet(s"$root/fact")
      var built = 0
      def fact = { built += 1; spark.read.parquet(s"$root/fact") }
      val navMeasures = Seq[AggNavigator.Measure](
        AggNavigator.CountAll("n"), AggNavigator.ExactSum("rev", "price"))
      val reg = AggNavigator.register(spark.read.parquet(s"$root/fact"),
        Seq("ym" -> Seq("y", "m"), "ym_status" -> Seq("y", "m", "status")),
        navMeasures, root)
      val got = CubeQuery.run(CubeQuery.Query(
        cube = CubeQuery.CubeRef(() => fact, registry = Some(reg)),
        hierarchies = hier))
      val rows = sortedRows(got)
      assert(built === 0,
        "a fully-covered member space must not construct the fact lineage")
      // ...and the routed answer equals the direct member space over
      // the same measure definitions
      val want = Cube.memberSets(spark.read.parquet(s"$root/fact"), hier,
        navMeasures.map(_.direct))
      assert(rows === sortedRows(want))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("MIXED drill-across: a routed side and a direct side merge conformed, routed side lineage-free") {
    val root = java.nio.file.Files.createTempDirectory("cq_mixed").toString
    try {
      wide.filter(col("status") === "O").write.parquet(s"$root/fa")
      val fb = wide.filter(col("status") =!= "O")
      var built = 0
      def fa = { built += 1; spark.read.parquet(s"$root/fa") }
      val regA = AggNavigator.register(spark.read.parquet(s"$root/fa"),
        Seq("y" -> Seq("y")),
        Seq[AggNavigator.Measure](AggNavigator.ExactSum("open_rev", "price")),
        root)
      val got = CubeQuery.run(CubeQuery.Query(
        cube = CubeQuery.CubeRef(() => fa, registry = Some(regA)),
        grain = Seq("y"),
        drillAcross = Seq(CubeQuery.CubeRef(() => fb,
          measures = Seq(sum(col("price").cast("decimal(18,2)"))
            .cast("double").as("other_rev")))),
        derived = Seq((coalesce(col("open_rev"), lit(0.0)) +
          coalesce(col("other_rev"), lit(0.0))).as("total_rev"))))
      val rows = got.orderBy("y").collect()
        .map(r => (r.getAs[Int]("y"), r.getAs[Double]("total_rev")))
      assert(built === 0, "the covered side must route, not rebuild")
      // expected = the same per-side exact decimal sums, added in
      // double exactly as the derived column does (NOT a single
      // whole-fact decimal sum — double addition is not associative
      // with the decimal→double cast)
      def side(f: DataFrame, n: String) = f.groupBy("y")
        .agg(sum(col("price").cast("decimal(18,2)")).cast("double").as(n))
      val want = side(spark.read.parquet(s"$root/fa"), "a")
        .join(side(fb, "b"), Seq("y"), "full_outer")
        .select(col("y"), (coalesce(col("a"), lit(0.0)) +
          coalesce(col("b"), lit(0.0))).as("t"))
        .orderBy("y").collect()
        .map(r => (r.getAs[Int]("y"), r.getAs[Double]("t")))
      assert(rows.toSeq === want.toSeq)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("unservable shapes are rejected loudly") {
    val direct = CubeQuery.CubeRef(() => wide, measures = measures)
    // both member space and grain
    intercept[IllegalArgumentException] {
      CubeQuery.run(CubeQuery.Query(direct, hierarchies = hier,
        grain = Seq("y")))
    }
    // neither
    intercept[IllegalArgumentException] {
      CubeQuery.run(CubeQuery.Query(direct))
    }
    // a CubeRef claiming both direct measures and a registry
    intercept[IllegalArgumentException] {
      CubeQuery.CubeRef(() => wide, measures = measures,
        registry = Some(null))
    }
    // drill-across without a conformed grain
    intercept[IllegalArgumentException] {
      CubeQuery.run(CubeQuery.Query(direct, hierarchies = hier,
        drillAcross = Seq(direct)))
    }
  }

  test("front-door lowering is PLAN-identical to the direct calls (canonicalized)") {
    // drill-across shape (q219's): same grouped aggregates, same
    // conformed merge, same derived column
    val fa = wide.filter(col("status") === "O")
    val fb = wide.filter(col("status") =!= "O")
    val ma = Seq(count(lit(1)).as("n_a"),
      sum(col("price").cast("decimal(18,2)")).cast("double").as("rev_a"))
    val mb = Seq(count(lit(1)).as("n_b"),
      sum(col("price").cast("decimal(18,2)")).cast("double").as("rev_b"))
    val derived = Seq((coalesce(col("rev_a"), lit(0.0)) -
      coalesce(col("rev_b"), lit(0.0))).as("net"))
    val direct = DrillAcross.drillAcross(fa, ma, fb, mb,
      on = Seq("y", "m"), derived = derived)
    val doored = CubeQuery.run(CubeQuery.Query(
      cube = CubeQuery.CubeRef(() => fa, measures = ma),
      grain = Seq("y", "m"),
      drillAcross = Seq(CubeQuery.CubeRef(() => fb, measures = mb)),
      derived = derived))
    assert(doored.queryExecution.optimizedPlan.canonicalized ===
      direct.queryExecution.optimizedPlan.canonicalized,
      "the declarative layer must add NOTHING to the drill-across plan")
    // member-space shape (q203's)
    val directMs = Cube.memberSets(wide, hier, measures)
    val dooredMs = CubeQuery.run(CubeQuery.Query(
      cube = CubeQuery.CubeRef(() => wide, measures = measures),
      hierarchies = hier))
    assert(dooredMs.queryExecution.optimizedPlan.canonicalized ===
      directMs.queryExecution.optimizedPlan.canonicalized,
      "the declarative layer must add NOTHING to the member-space plan")
  }

  test("JSON wire binding: catalog resolution, overrides, and malformed documents are loud") {
    val catalog = Map(
      "orders" -> CubeQuery.CubeRef(() => wide, measures = measures))
    // happy path: a member space from the wire equals the Scala call
    val got = CubeQuery.runJson(
      """{"cube":"orders",
        | "hierarchies":[{"name":"fecha","levels":["y","m"]},
        |                {"name":"estado","levels":["status"]}],
        | "measures":{"orders":[
        |   {"as":"n","expr":"count(1)"},
        |   {"as":"rev","expr":"cast(sum(cast(price as decimal(18,2))) as double)"}]}
        |}""".stripMargin, catalog)
    val want = Cube.memberSets(wide, hier, measures)
    assert(sortedRows(got) === sortedRows(want))
    // unknown cube name lists the catalog
    val e1 = intercept[IllegalArgumentException] {
      CubeQuery.fromJson("""{"cube":"nope","grain":["y"]}""", catalog)
    }
    assert(e1.getMessage.contains("not in the catalog") &&
      e1.getMessage.contains("orders"))
    // measure override on a ROUTED cube is rejected
    val root = java.nio.file.Files.createTempDirectory("cq_json").toString
    try {
      val reg = AggNavigator.register(wide, Seq("y" -> Seq("y")),
        Seq[AggNavigator.Measure](AggNavigator.CountAll("n")), root)
      val routed = Map("orders" -> CubeQuery.CubeRef(() => wide,
        registry = Some(reg)))
      val e2 = intercept[IllegalArgumentException] {
        CubeQuery.fromJson(
          """{"cube":"orders","grain":["y"],
            | "measures":{"orders":[{"as":"n","expr":"count(1)"}]}}"""
            .stripMargin, routed)
      }
      assert(e2.getMessage.contains("ROUTED"))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    // malformed field shapes are named, not NPE'd
    val e3 = intercept[IllegalArgumentException] {
      CubeQuery.fromJson("""{"cube":"orders","grain":"y"}""", catalog)
    }
    assert(e3.getMessage.contains("'grain'"))
    val e4 = intercept[IllegalArgumentException] {
      CubeQuery.fromJson("""{"grain":["y"]}""", catalog)
    }
    assert(e4.getMessage.contains("'cube'"))
    // an UNKNOWN top-level field is a typo that would otherwise run
    // the query silently wrong (the "slicer" for "slicers" case)
    val e5 = intercept[IllegalArgumentException] {
      CubeQuery.fromJson(
        """{"cube":"orders","grain":["y"],"slicer":["y >= 1996"]}""",
        catalog)
    }
    assert(e5.getMessage.contains("'slicer'") &&
      e5.getMessage.contains("slicers"))
    // a measure override keyed on an unreferenced cube (case typo)
    // must not silently fall back to the catalog's default measures
    val e6 = intercept[IllegalArgumentException] {
      CubeQuery.fromJson(
        """{"cube":"orders","grain":["y"],
          | "measures":{"Orders":[{"as":"n","expr":"count(1)"}]}}"""
          .stripMargin, catalog)
    }
    assert(e6.getMessage.contains("'Orders'"))
    // a missing sub-field is a NAMED IllegalArgumentException, not a
    // raw json4s MappingException
    val e7 = intercept[IllegalArgumentException] {
      CubeQuery.fromJson(
        """{"cube":"orders","grain":["y"],"derived":[{"as":"net"}]}""",
        catalog)
    }
    assert(e7.getMessage.contains("derived[0].expr"))
  }

  test("explicit-sets face: direct ≡ GROUPING SETS, routed ≡ per-set navigation, wire binds it, All member included") {
    val sets = Seq(Seq.empty[String], Seq("y"), Seq("y", "m"))
    val direct = CubeQuery.run(CubeQuery.Query(
      cube = CubeQuery.CubeRef(() => wide, measures = measures),
      sets = sets))
    val want = wide.groupingSets(
        Seq(Seq.empty[Column], Seq(col("y")), Seq(col("y"), col("m"))),
        col("y"), col("m"))
      .agg(measures.head, measures.tail :+
        grouping_id().cast("long").as("gid"): _*)
    assert(sortedRows(direct) === sortedRows(want))
    // routed: same cells from the registry, zero fact lineage
    val root = java.nio.file.Files.createTempDirectory("cq_sets").toString
    try {
      wide.write.parquet(s"$root/fact")
      var built = 0
      def fact = { built += 1; spark.read.parquet(s"$root/fact") }
      val navMeasures = Seq[AggNavigator.Measure](
        AggNavigator.CountAll("n"), AggNavigator.ExactSum("rev", "price"))
      val reg = AggNavigator.register(spark.read.parquet(s"$root/fact"),
        Seq("ym" -> Seq("y", "m")), navMeasures, root)
      val routed = CubeQuery.run(CubeQuery.Query(
        cube = CubeQuery.CubeRef(() => fact, registry = Some(reg)),
        sets = sets))
      val rows = sortedRows(routed)
      assert(built === 0,
        "a fully-covered set list must not construct the fact lineage")
      assert(rows === sortedRows(want))
      // the JSON wire binds the same face ([] = the All member)
      val wired = CubeQuery.runJson(
        """{"cube":"orders","sets":[[], ["y"], ["y","m"]]}""",
        Map("orders" -> CubeQuery.CubeRef(() => fact,
          registry = Some(reg))))
      assert(sortedRows(wired) === sortedRows(want))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    // exactly one face: sets + grain together is rejected
    intercept[IllegalArgumentException] {
      CubeQuery.run(CubeQuery.Query(
        CubeQuery.CubeRef(() => wide, measures = measures),
        grain = Seq("y"), sets = Seq(Seq("y"))))
    }
    // malformed wire sets are named
    val e = intercept[IllegalArgumentException] {
      CubeQuery.fromJson("""{"cube":"orders","sets":["y"]}""",
        Map("orders" -> CubeQuery.CubeRef(() => wide,
          measures = measures)))
    }
    assert(e.getMessage.contains("'sets[0]'"))
  }

  test("wire expressions are GATED: no reflection, no subqueries, no nondeterminism from an untrusted client") {
    val catalog = Map(
      "orders" -> CubeQuery.CubeRef(() => wide, measures = measures))
    def gated(json: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        CubeQuery.fromJson(json, catalog)
      }
      assert(e.getMessage.contains(needle),
        s"want '$needle' in: ${e.getMessage}")
    }
    // the r15 ADVICE scenario: a slicer string reaching expr() gives
    // a wire client arbitrary JVM calls — the allowlist stops it at
    // parse time, naming the function
    gated(
      """{"cube":"orders","grain":["y"],
        | "slicers":["reflect('java.lang.System','getProperty','user.dir') is not null"]}"""
        .stripMargin, "'reflect'")
    gated(
      """{"cube":"orders","grain":["y"],
        | "measures":{"orders":[{"as":"n","expr":"java_method('java.lang.Runtime','getRuntime') is not null"}]}}"""
        .stripMargin, "'java_method'")
    // nondeterministic functions are absent from the default list (a
    // cube query must be replayable)
    gated(
      """{"cube":"orders","grain":["y"],"slicers":["rand() > 0.5"]}""",
      "'rand'")
    // subqueries are rejected structurally, whatever they call
    gated(
      """{"cube":"orders","grain":["y"],
        | "slicers":["y in (select 1996)"]}""".stripMargin, "subquery")
    // an unparseable expression is a NAMED wire error
    gated(
      """{"cube":"orders","grain":["y"],"slicers":["y >= >= 1996"]}""",
      "failed to parse")
    // the allowlisted surface still covers the real queries (q228's
    // exact shapes parse clean)...
    val q = CubeQuery.fromJson(
      """{"cube":"orders","grain":["y"],
        | "slicers":["y >= 1996 and upper(status) like 'O%'"],
        | "measures":{"orders":[
        |   {"as":"n","expr":"count(1)"},
        |   {"as":"rev","expr":"cast(sum(cast(price as decimal(18,2))) as double)"}]},
        | "derived":[{"as":"net","expr":"coalesce(rev, 0.0) - 1.0"}]}"""
        .stripMargin, catalog)
    assert(CubeQuery.run(q).collect().nonEmpty)
    // ...and a fully-trusted client can opt out explicitly
    val trusted = CubeQuery.fromJson(
      """{"cube":"orders","grain":["y"],
        | "slicers":["hex(y) is not null"]}""".stripMargin,
      catalog, allowedFunctions = CubeQuery.UnrestrictedWire)
    assert(CubeQuery.run(trusted).collect().nonEmpty)
    // per-deployment extension: the same function admitted by name
    val extended = CubeQuery.fromJson(
      """{"cube":"orders","grain":["y"],
        | "slicers":["hex(y) is not null"]}""".stripMargin,
      catalog,
      allowedFunctions = CubeQuery.DefaultWireFunctions + "hex")
    assert(CubeQuery.run(extended).collect().nonEmpty)
  }
}
