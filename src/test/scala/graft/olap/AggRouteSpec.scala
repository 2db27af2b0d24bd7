package graft.olap

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Transparent SQL→rollup rewrite ([[AggRoute]]): literal `spark.sql`
  * text over the routed fact path must answer from the smallest
  * covering aggregate table — value-identical to the unrouted plan,
  * with the fact absent from the rewritten lineage — and every
  * ineligible shape must fall through to the fact untouched. */
class AggRouteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val root =
    java.nio.file.Files.createTempDirectory("aggroute_spec").toString
  private lazy val factPath = s"$root/fact"

  private val measures = Seq(
    AggNavigator.CountAll("n"),
    AggNavigator.ExactAvg("avg_price", "price"),
    AggNavigator.ExactSum("sum_price", "price"))

  // built once: a star-ish fact staged to parquet (the routed path
  // must be a STORED table — that is what the rule keys on), three
  // rollups, the route, and a temp view for SQL text
  private lazy val reg: AggNavigator.Registry = {
    TestSpark.table("orders")
      .select(col("o_orderstatus").as("status"),
        col("o_orderpriority").as("prio"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        when(col("o_orderkey") % 7 =!= 0, col("o_totalprice")).as("price"))
      .write.mode("overwrite").parquet(factPath)
    val fact = spark.read.parquet(factPath)
    val r = AggNavigator.register(fact,
      Seq("ym" -> Seq("y", "m"), "y_status" -> Seq("y", "status"),
        "status_prio" -> Seq("status", "prio")),
      measures, root)
    AggRoute.route(factPath, r)
    spark.read.parquet(factPath).createOrReplaceTempView("aggroute_fact")
    r
  }

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  private def assertRouted(df: DataFrame, table: String): Unit = {
    val paths = scanPaths(df)
    assert(paths.nonEmpty && paths.forall(_.contains(s"agg_$table")),
      s"expected a rewrite onto agg_$table, scans: $paths")
    assert(!paths.exists(_.endsWith("/fact")),
      s"fact path must be absent from a routed plan, scans: $paths")
  }

  private def assertUnrouted(df: DataFrame): Unit = {
    val paths = scanPaths(df)
    assert(paths.exists(_.endsWith("/fact")),
      s"expected the fact scan to survive, scans: $paths")
  }

  /** The same SQL answered with routing detached — the ground truth
    * every routed result must equal exactly. */
  private def unroutedRows(sql: String): Seq[Seq[Any]] = {
    AggRoute.unroute(spark, factPath)
    try TestSpark.sortedRows(spark.sql(sql))
    finally AggRoute.route(factPath, reg)
  }

  private def check(sql: String, table: String): Unit = {
    reg: Unit
    val routed = spark.sql(sql)
    assertRouted(routed, table)
    assert(TestSpark.sortedRows(routed) == unroutedRows(sql))
  }

  test("plain group-by over every declared measure routes to the " +
      "smallest covering rollup") {
    check(
      """SELECT y, m, count(*) AS n,
        | round(CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
        |   / count(price), 6) AS avg_price,
        | CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM aggroute_fact GROUP BY y, m""".stripMargin, "ym")
  }

  test("subset grain routes; smallest covering table wins") {
    // group by y alone: both ym and y_status cover — ym is smaller
    // at sf0.001 (fewer distinct (y,m) than (y,status))? the rule
    // must agree with the navigator's own choice either way
    val chosen = reg.choose(Seq("y")).get.name
    check("SELECT y, count(*) AS n FROM aggroute_fact GROUP BY y", chosen)
  }

  test("grand total (no GROUP BY) routes") {
    val chosen = reg.choose(Nil).get.name
    check("SELECT count(*) AS n FROM aggroute_fact", chosen)
  }

  test("scalar arithmetic over matched measures and grouping columns " +
      "routes — renamed aliases, reordered projection, derived ratio") {
    check(
      """SELECT count(*) + 1 AS n_plus,
        | concat(status, '-') AS tag,
        | CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
        |   / (count(*) + 0.0) AS crude_mean,
        | y
        |FROM aggroute_fact GROUP BY y, status""".stripMargin, "y_status")
  }

  test("WHERE on grain columns routes (whole-group selection commutes " +
      "with partial aggregation)") {
    check(
      """SELECT y, count(*) AS n FROM aggroute_fact
        |WHERE y >= 1996 AND m <= 6 GROUP BY y""".stripMargin, "ym")
  }

  test("SELECT DISTINCT over levels routes (the rollup holds every " +
      "live member combination)") {
    check("SELECT DISTINCT status, prio FROM aggroute_fact", "status_prio")
  }

  test("HAVING (a filter above the aggregate) survives the rewrite") {
    check(
      """SELECT y, count(*) AS n FROM aggroute_fact
        |GROUP BY y HAVING count(*) > 10""".stripMargin,
      reg.choose(Seq("y")).get.name)
  }

  test("undeclared aggregate falls through to the fact") {
    reg: Unit
    assertUnrouted(spark.sql(
      "SELECT y, max(price) AS mx FROM aggroute_fact GROUP BY y"))
    assertUnrouted(spark.sql(
      "SELECT y, count(DISTINCT prio) AS d FROM aggroute_fact GROUP BY y"))
  }

  test("WHERE on a non-grain column falls through (filtering fact rows " +
      "does not commute with stored partials)") {
    reg: Unit
    assertUnrouted(spark.sql(
      """SELECT y, count(*) AS n FROM aggroute_fact
        |WHERE price > 1000 GROUP BY y""".stripMargin))
  }

  test("uncovered grain falls through") {
    reg: Unit
    assertUnrouted(spark.sql(
      "SELECT prio, y, count(*) AS n FROM aggroute_fact GROUP BY prio, y"))
  }

  test("computed grouping expression falls through (levels are stored " +
      "columns by contract)") {
    reg: Unit
    assertUnrouted(spark.sql(
      "SELECT y + 1 AS y1, count(*) AS n FROM aggroute_fact GROUP BY y + 1"))
  }

  test("an unrelated parquet table with the same column names is " +
      "untouched") {
    reg: Unit
    val other = s"$root/other"
    spark.read.parquet(factPath).limit(50).write
      .mode("overwrite").parquet(other)
    spark.read.parquet(other).createOrReplaceTempView("aggroute_other")
    val paths = scanPaths(spark.sql(
      "SELECT y, count(*) AS n FROM aggroute_other GROUP BY y"))
    assert(paths.exists(_.endsWith("/other")) &&
      !paths.exists(_.contains("agg_")),
      s"the unrouted sibling table must scan itself, scans: $paths")
  }

  test("unroute detaches: the same SQL plans against the fact again") {
    reg: Unit
    AggRoute.unroute(spark, factPath)
    try assertUnrouted(spark.sql(
      "SELECT y, count(*) AS n FROM aggroute_fact GROUP BY y"))
    finally AggRoute.route(factPath, reg)
  }

  test("routed DataFrame-API aggregates rewrite too (the rule sees " +
      "logical plans, not SQL text)") {
    reg: Unit
    val df = spark.read.parquet(factPath).groupBy("y", "m")
      .agg(count(lit(1)).as("n"))
    assertRouted(df, "ym")
    assert(TestSpark.sortedRows(df) ==
      unroutedRows(
        "SELECT y, m, count(*) AS n FROM aggroute_fact GROUP BY y, m"))
  }

  test("rewrite output equals the direct answer bit-for-bit on the " +
      "HLL sketch measure as well") {
    val root2 = java.nio.file.Files.createTempDirectory("aggroute_hll")
      .toString
    val fp = s"$root2/fact"
    try {
      TestSpark.table("orders")
        .select(year(col("o_orderdate")).as("y"),
          col("o_custkey").as("cust"))
        .write.mode("overwrite").parquet(fp)
      val ms = Seq(AggNavigator.CountAll("n"),
        AggNavigator.DistinctSketch("uniq_cust", "cust"))
      val r = AggNavigator.register(spark.read.parquet(fp),
        Seq("y" -> Seq("y")), ms, root2)
      AggRoute.route(fp, r)
      try {
        val routed = spark.read.parquet(fp).groupBy("y").agg(
          count(lit(1)).as("n"),
          hll_sketch_estimate(hll_sketch_agg(col("cust"), lit(12)))
            .as("uniq_cust"))
        assertRouted(routed, "y")
        AggRoute.unroute(spark, fp)
        val direct = spark.read.parquet(fp).groupBy("y").agg(
          count(lit(1)).as("n"),
          hll_sketch_estimate(hll_sketch_agg(col("cust"), lit(12)))
            .as("uniq_cust"))
        AggRoute.route(fp, r)
        assert(TestSpark.sortedRows(routed) == TestSpark.sortedRows(direct))
      } finally AggRoute.unroute(spark, fp)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root2))
  }
}
