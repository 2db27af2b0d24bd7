package graft.olap

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The MDX subset parses into the declarative front door, lowers to
  * the SAME plans as the Scala calls, routes through registries with
  * zero fact lineage, and refuses everything outside the subset
  * loudly. */
class MdxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val wide = TestSpark.table("orders")
    .select(col("o_orderstatus").as("status"),
      col("o_orderpriority").as("prio"),
      year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
      col("o_totalprice").as("price"))

  private val hierSchema = Seq(
    Cube.Hierarchy("fecha", Seq("y", "m")),
    Cube.Hierarchy("estado", Seq("status")))

  private val measures = Seq(count(lit(1)).as("n"),
    sum(col("price").cast("decimal(18,2)")).cast("double").as("rev"))

  private def catalog = Map(
    "orders" -> CubeQuery.CubeRef(() => wide, measures = measures))
  private def schema = Map("orders" -> hierSchema)

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    TestSpark.sortedRows(df)

  test("a CROSSJOIN drill with a slicer equals the direct Scala call, plan-identically") {
    val got = Mdx.run(
      """SELECT {[Measures].[n], [Measures].[rev]} ON COLUMNS,
        | CROSSJOIN({[fecha].[m].Members}, {[estado].[status].Members})
        |   ON ROWS
        |FROM [orders]
        |WHERE ([fecha].[y].[1996])""".stripMargin, catalog, schema)
    // [fecha].[m].Members expands to the level PREFIX (y, m) — member
    // identity includes ancestors; the slicer literal types by the
    // column (y is int → int literal after constant folding)
    val want = wide.filter(col("y") === lit(1996))
      .groupBy("y", "m", "status").agg(measures.head, measures.tail: _*)
    assert(got.queryExecution.optimizedPlan.canonicalized ===
      want.queryExecution.optimizedPlan.canonicalized,
      "the MDX layer must add NOTHING to the drill plan")
    val rows = got.orderBy("y", "m", "status").collect().map(_.toSeq).toSeq
    val wantRows = want.select(got.columns.map(col): _*)
      .orderBy("y", "m", "status").collect().map(_.toSeq).toSeq
    assert(rows === wantRows && rows.nonEmpty)
  }

  test("measure selection on COLUMNS is a subset by alias, applied AFTER aggregation") {
    val got = Mdx.run(
      """SELECT {[Measures].[rev]} ON COLUMNS,
        | {[estado].[status].Members} ON ROWS
        |FROM [orders]""".stripMargin, catalog, schema)
    assert(got.columns.toSeq === Seq("status", "rev"))
    val want = wide.groupBy("status")
      .agg(sum(col("price").cast("decimal(18,2)")).cast("double").as("rev"))
    assert(got.orderBy("status").collect().map(_.toSeq).toSeq ===
      want.orderBy("status").collect().map(_.toSeq).toSeq)
  }

  test("a ROUTED cube answers MDX from the registry with zero fact lineage") {
    val root = java.nio.file.Files.createTempDirectory("mdx_routed").toString
    try {
      wide.write.parquet(s"$root/fact")
      var built = 0
      def fact = { built += 1; spark.read.parquet(s"$root/fact") }
      val reg = AggNavigator.register(spark.read.parquet(s"$root/fact"),
        Seq("ym" -> Seq("y", "m")),
        Seq[AggNavigator.Measure](AggNavigator.CountAll("n"),
          AggNavigator.ExactSum("rev", "price")), root)
      val got = Mdx.run(
        """SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[m].Members} ON ROWS
          |FROM [orders]""".stripMargin,
        Map("orders" -> CubeQuery.CubeRef(() => fact,
          registry = Some(reg))), schema)
      val rows = got.orderBy("y", "m").collect()
      assert(built === 0,
        "a covered MDX drill must not construct the fact lineage")
      val want = spark.read.parquet(s"$root/fact")
        .groupBy("y", "m").agg(count(lit(1)).as("n"))
        .orderBy("y", "m").collect()
      assert(rows.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
      // ...and a WHERE slicer whose level the rollup's grain carries
      // is SERVED FROM STORED PARTIALS (the r16 commute — Mondrian's
      // sliced-MDX-from-agg-tables behavior), still without
      // constructing the fact lineage: the slicer value types by the
      // registry's captured grain types, not the fact schema
      val slicedRows = Mdx.run(
        """SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[m].Members} ON ROWS
          |FROM [orders] WHERE ([fecha].[y].[1996])""".stripMargin,
        Map("orders" -> CubeQuery.CubeRef(() => fact,
          registry = Some(reg))), schema).orderBy("y", "m").collect()
      assert(built === 0,
        "a covered SLICED drill must not construct the fact lineage")
      val slicedWant = spark.read.parquet(s"$root/fact")
        .filter(col("y") === 1996)
        .groupBy("y", "m").agg(count(lit(1)).as("n"))
        .orderBy("y", "m").collect()
      assert(slicedRows.map(_.toSeq).toSeq ===
        slicedWant.map(_.toSeq).toSeq)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("set UNION on ROWS lowers to the explicit-sets face: one GROUPING SETS pass, gid cell identity") {
    val got = Mdx.run(
      """SELECT {[Measures].[n], [Measures].[rev]} ON COLUMNS,
        | {[fecha].[y].Members, [estado].[status].Members} ON ROWS
        |FROM [orders]""".stripMargin, catalog, schema)
    // sets = {(y), (status)}; gid bits over allLevels (y, status)
    assert(got.columns.toSeq === Seq("y", "status", "gid", "n", "rev"))
    val want = wide.groupingSets(Seq(Seq(col("y")), Seq(col("status"))),
        col("y"), col("status"))
      .agg(measures.head, measures.tail :+
        grouping_id().cast("long").as("gid"): _*)
    assert(sortedRows(got) === sortedRows(want))
    // ONE aggregate (Expand-based), not one scan per set: a union of
    // the per-set aggregates would plan one more
    val aggCount = got.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size
    assert(aggCount === 1, "a set union must be one GROUPING SETS pass")
    // CROSSJOIN distributes over a union operand: {y, status} × {m}
    // = {(y,m)-grain set, (status,m)-grain set}
    val dist = Mdx.run(
      """SELECT {[Measures].[n]} ON COLUMNS,
        | CROSSJOIN({[fecha].[y].Members, [estado].[status].Members},
        |           {[fecha].[m].Members}) ON ROWS
        |FROM [orders]""".stripMargin, catalog, schema)
    val wantDist = wide.groupingSets(
        Seq(Seq(col("y"), col("m")), Seq(col("status"), col("y"), col("m"))),
        col("y"), col("m"), col("status"))
      .agg(count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
    assert(sortedRows(dist) === sortedRows(wantDist))
  }

  test("a ROUTED cube serves an MDX set union per-set from the registry, zero fact lineage") {
    val root = java.nio.file.Files.createTempDirectory("mdx_sets").toString
    try {
      wide.write.parquet(s"$root/fact")
      var built = 0
      def fact = { built += 1; spark.read.parquet(s"$root/fact") }
      val reg = AggNavigator.register(spark.read.parquet(s"$root/fact"),
        Seq("ym" -> Seq("y", "m"), "status" -> Seq("status")),
        Seq[AggNavigator.Measure](AggNavigator.CountAll("n")), root)
      val got = Mdx.run(
        """SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].Members, [estado].[status].Members} ON ROWS
          |FROM [orders]""".stripMargin,
        Map("orders" -> CubeQuery.CubeRef(() => fact,
          registry = Some(reg))), schema)
      val rows = sortedRows(got)
      assert(built === 0,
        "a fully-covered set union must not construct the fact lineage")
      val want = spark.read.parquet(s"$root/fact")
        .groupingSets(Seq(Seq(col("y")), Seq(col("status"))),
          col("y"), col("status"))
        .agg(count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
      assert(rows === sortedRows(want))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("axes in either order; string slicer values type as strings") {
    val got = Mdx.run(
      """select {[estado].[status].Members} on rows,
        | {[Measures].[n]} on columns
        |from orders where ([estado].[status].[O])""".stripMargin,
      catalog, schema)
    val want = wide.filter(col("status") === "O")
      .groupBy("status").agg(count(lit(1)).as("n"))
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
  }

  test("slicer values type by the CUBE COLUMN: digit strings stay strings on string levels, bad numerics are named errors") {
    import spark.implicits._
    // a string level with the '7' vs '007' member pair: value-shape
    // typing would cast the column and conflate them
    val codes = Seq(("7", 10.0), ("007", 99.0), ("7", 15.0))
      .toDF("code", "amt")
    val cat = Map("codes" -> CubeQuery.CubeRef(() => codes,
      measures = Seq(count(lit(1)).as("n"),
        sum(col("amt").cast("decimal(18,2)")).cast("double").as("rev"))))
    val sch = Map("codes" -> Seq(Cube.Hierarchy("c", Seq("code"))))
    val got = Mdx.run(
      """SELECT {[Measures].[n], [Measures].[rev]} ON COLUMNS,
        | {[c].[code].Members} ON ROWS
        |FROM [codes] WHERE ([c].[code].[7])""".stripMargin, cat, sch)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("7", 2L, 25.0)),
      "member '007' must NOT satisfy the [7] slicer on a string level")
    // a non-numeric value on a numeric level is a NAMED error, not a
    // silently-empty result (the cast would null it out)
    val e1 = intercept[IllegalArgumentException] {
      Mdx.run(
        """SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].Members} ON ROWS
          |FROM [orders] WHERE ([fecha].[y].[abc])""".stripMargin,
        catalog, schema)
    }
    assert(e1.getMessage.contains("does not cast to"))
    // ...and so is an integer that would overflow the column type
    val e2 = intercept[IllegalArgumentException] {
      Mdx.run(
        """SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].Members} ON ROWS
          |FROM [orders] WHERE ([fecha].[y].[99999999999999999999])"""
          .stripMargin, catalog, schema)
    }
    assert(e2.getMessage.contains("does not cast to"))
    // the check is generic over the column type — a malformed DATE
    // value is equally named, and a valid one slices normally
    val dated = Seq(
      (java.sql.Date.valueOf("2024-01-01"), 1.0),
      (java.sql.Date.valueOf("2024-01-02"), 2.0)).toDF("d", "amt")
    val dcat = Map("dates" -> CubeQuery.CubeRef(() => dated,
      measures = Seq(count(lit(1)).as("n"))))
    val dsch = Map("dates" -> Seq(Cube.Hierarchy("dh", Seq("d"))))
    val e3 = intercept[IllegalArgumentException] {
      Mdx.run(
        """SELECT {[Measures].[n]} ON COLUMNS,
          | {[dh].[d].Members} ON ROWS
          |FROM [dates] WHERE ([dh].[d].[2024-13-99])""".stripMargin,
        dcat, dsch)
    }
    assert(e3.getMessage.contains("does not cast to"))
    val okDate = Mdx.run(
      """SELECT {[Measures].[n]} ON COLUMNS,
        | {[dh].[d].Members} ON ROWS
        |FROM [dates] WHERE ([dh].[d].[2024-01-01])""".stripMargin,
      dcat, dsch)
    assert(okDate.collect().map(r =>
      (r.getDate(0).toString, r.getLong(1))).toSeq ===
      Seq(("2024-01-01", 1L)))
    // duplicate grains across a set union collapse to ONE member set
    // (set semantics — duplicates would double every cell at the
    // same gid)
    val dup = Mdx.run(
      """SELECT {[Measures].[n]} ON COLUMNS,
        | {[estado].[status].Members, [estado].[status].Members} ON ROWS
        |FROM [orders]""".stripMargin, catalog, schema)
    val statuses = wide.select("status").distinct().count()
    assert(dup.count() === statuses,
      "duplicate sets must not double the member cells")
  }

  test("WITH MEMBER: calculated members are gated post-agg projections, routed cubes stay lineage-free") {
    val got = Mdx.run(
      """WITH MEMBER [Measures].[rev_per] AS
        | 'round([Measures].[rev] / [Measures].[n], 2)'
        |SELECT {[Measures].[n], [Measures].[rev_per]} ON COLUMNS,
        | {[estado].[status].Members} ON ROWS
        |FROM [orders]""".stripMargin, catalog, schema)
    assert(got.columns.toSeq === Seq("status", "n", "rev_per"))
    val want = wide.groupBy("status")
      .agg(count(lit(1)).as("n"),
        sum(col("price").cast("decimal(18,2)")).cast("double").as("rev"))
      .select(col("status"), col("n"),
        round(col("rev") / col("n"), 2).as("rev_per"))
    assert(sortedRows(got) === sortedRows(want))
    // a calc member over a ROUTED cube is a projection of stored
    // partials — zero fact lineage
    val root = java.nio.file.Files.createTempDirectory("mdx_calc").toString
    try {
      wide.write.parquet(s"$root/fact")
      var built = 0
      def fact = { built += 1; spark.read.parquet(s"$root/fact") }
      val reg = AggNavigator.register(spark.read.parquet(s"$root/fact"),
        Seq("status" -> Seq("status")),
        Seq[AggNavigator.Measure](AggNavigator.CountAll("n"),
          AggNavigator.ExactSum("rev", "price")), root)
      val routed = Mdx.run(
        """WITH MEMBER [Measures].[rev_per] AS
          | 'round([Measures].[rev] / [Measures].[n], 2)'
          |SELECT {[Measures].[rev_per]} ON COLUMNS,
          | {[estado].[status].Members} ON ROWS
          |FROM [orders]""".stripMargin,
        Map("orders" -> CubeQuery.CubeRef(() => fact,
          registry = Some(reg))), schema)
      routed.collect(): Unit
      assert(built === 0,
        "a calc member must not force the fact lineage on a routed cube")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    // the GATE applies to calc expressions — MDX is untrusted text
    val e1 = intercept[IllegalArgumentException] {
      Mdx.run(
        """WITH MEMBER [Measures].[evil] AS
          | 'reflect("java.lang.System", "getProperty", "user.dir")'
          |SELECT {[Measures].[evil]} ON COLUMNS,
          | {[estado].[status].Members} ON ROWS
          |FROM [orders]""".stripMargin, catalog, schema)
    }
    assert(e1.getMessage.contains("'reflect'"))
    // collisions and malformed WITH clauses are named
    val e2 = intercept[IllegalArgumentException] {
      Mdx.run(
        """WITH MEMBER [Measures].[n] AS '1 + 1'
          |SELECT {[Measures].[n]} ON COLUMNS,
          | {[estado].[status].Members} ON ROWS
          |FROM [orders]""".stripMargin, catalog, schema)
    }
    assert(e2.getMessage.contains("collides"))
    val e3 = intercept[IllegalArgumentException] {
      Mdx.parse(
        """WITH MEMBER [Measures].[a] AS '1' MEMBER [Measures].[a] AS '2'
          |SELECT {[Measures].[a]} ON COLUMNS,
          | {[estado].[status].Members} ON ROWS
          |FROM [orders]""".stripMargin)
    }
    assert(e3.getMessage.contains("duplicate calculated member"))
    val e4 = intercept[IllegalArgumentException] {
      Mdx.parse("WITH SELECT {[Measures].[n]} ON COLUMNS, " +
        "{[estado].[status].Members} ON ROWS FROM [orders]")
    }
    assert(e4.getMessage.contains("at least one MEMBER"))
  }

  test("axis member literals are post-agg cell selection: routed cubes serve them with zero fact lineage") {
    // {[1996], [1997]} × status.Members: the drill runs at the
    // (y, status) grain and the year selection filters the
    // AGGREGATED cells — equivalent to the pre-agg filter on a
    // direct cube because the grain contains the level
    val got = Mdx.run(
      """SELECT {[Measures].[n], [Measures].[rev]} ON COLUMNS,
        | CROSSJOIN({[fecha].[y].[1996], [fecha].[y].[1997]},
        |           {[estado].[status].Members}) ON ROWS
        |FROM [orders]""".stripMargin, catalog, schema)
    val want = wide.filter(col("y").isin(1996, 1997))
      .groupBy("y", "status").agg(measures.head, measures.tail: _*)
    assert(sortedRows(got) === sortedRows(want))
    assert(got.count() > 0)
    // a literal beside the same level's .Members is absorbed (all ⊇ any)
    val absorbed = Mdx.run(
      """SELECT {[Measures].[n]} ON COLUMNS,
        | {[fecha].[y].[1996], [fecha].[y].Members} ON ROWS
        |FROM [orders]""".stripMargin, catalog, schema)
    assert(absorbed.count() === wide.select("y").distinct().count())
    // ROUTED: the cell selection reads stored partials only
    val root = java.nio.file.Files.createTempDirectory("mdx_lit").toString
    try {
      wide.write.parquet(s"$root/fact")
      var built = 0
      def fact = { built += 1; spark.read.parquet(s"$root/fact") }
      val reg = AggNavigator.register(spark.read.parquet(s"$root/fact"),
        Seq("y" -> Seq("y")),
        Seq[AggNavigator.Measure](AggNavigator.CountAll("n")), root)
      val routed = Mdx.run(
        """SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].[1996]} ON ROWS
          |FROM [orders]""".stripMargin,
        Map("orders" -> CubeQuery.CubeRef(() => fact,
          registry = Some(reg))), schema)
      val rows = routed.collect()
      assert(built === 0,
        "axis member selection must not construct the fact lineage " +
          "on a routed cube — it is cell selection, not a slicer")
      val wantN = spark.read.parquet(s"$root/fact")
        .filter(col("y") === 1996).count()
      assert(rows.map(_.toSeq).toSeq === Seq(Seq(1996, wantN)))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    // literals type by the cube column: digit strings stay strings
    // on string levels ('007' must not satisfy [7]), bad numerics
    // are named errors
    import spark.implicits._
    val codes = Seq(("7", 1), ("007", 1), ("7", 1)).toDF("code", "k")
    val cat = Map("codes" -> CubeQuery.CubeRef(() => codes,
      measures = Seq(count(lit(1)).as("n"))))
    val sch = Map("codes" -> Seq(Cube.Hierarchy("c", Seq("code"))))
    val lit7 = Mdx.run(
      """SELECT {[Measures].[n]} ON COLUMNS,
        | {[c].[code].[7]} ON ROWS FROM [codes]""".stripMargin, cat, sch)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(lit7.toSeq === Seq(("7", 2L)))
    val e = intercept[IllegalArgumentException] {
      Mdx.run(
        """SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].[abc]} ON ROWS FROM [orders]""".stripMargin,
        catalog, schema)
    }
    assert(e.getMessage.contains("does not cast to"))
  }

  test("NON EMPTY drops cells where every selected measure is null") {
    import spark.implicits._
    // cells with a guaranteed-null measure: sum(v) is null for the
    // all-null groups b and d
    val df = Seq(("a", Option(10.0)), ("a", Option(5.0)),
      ("b", Option.empty[Double]), ("c", Option(1.0)),
      ("d", Option.empty[Double]), ("d", Option.empty[Double]))
      .toDF("k", "v")
    val cat = Map("t" -> CubeQuery.CubeRef(() => df,
      measures = Seq(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("sv"))))
    val sch = Map("t" -> Seq(Cube.Hierarchy("kh", Seq("k"))))
    val got = Mdx.run(
      """SELECT {[Measures].[sv]} ON COLUMNS,
        | NON EMPTY {[kh].[k].Members} ON ROWS
        |FROM [t]""".stripMargin, cat, sch)
    assert(got.orderBy("k").collect().map(r =>
      (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("a", 15.0), ("c", 1.0)),
      "the all-null cells b and d must drop")
    // NON EMPTY is selected-measure scoped: selecting the never-null
    // count keeps every cell
    val all = Mdx.run(
      """SELECT {[Measures].[n]} ON COLUMNS,
        | NON EMPTY {[kh].[k].Members} ON ROWS
        |FROM [t]""".stripMargin, cat, sch)
    assert(all.count() === 4)
    // ...and ANY non-null selected measure keeps the cell (Mondrian
    // prunes tuples empty in EVERY cell, not in some)
    val both = Mdx.run(
      """SELECT {[Measures].[n], [Measures].[sv]} ON COLUMNS,
        | NON EMPTY {[kh].[k].Members} ON ROWS
        |FROM [t]""".stripMargin, cat, sch)
    assert(both.count() === 4)
  }

  test("TOPCOUNT/BOTTOMCOUNT are deterministic post-agg rank-n: measure order, grain tie-break") {
    val got = Mdx.run(
      """SELECT {[Measures].[n], [Measures].[rev]} ON COLUMNS,
        | TOPCOUNT(CROSSJOIN({[fecha].[y].Members}, {[fecha].[m].Members}),
        |          5, [Measures].[rev]) ON ROWS
        |FROM [orders]""".stripMargin, catalog, schema)
    val base = wide.groupBy("y", "m").agg(measures.head, measures.tail: _*)
    val want = base.orderBy(col("rev").desc_nulls_last,
        col("y").asc_nulls_first, col("m").asc_nulls_first)
      .limit(5).select("y", "m", "n", "rev")
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
    assert(got.count() === 5)
    // the scale contract: rank-n is a bounded-heap TakeOrdered over
    // the aggregate, never a full global sort materialization
    val phys = got.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      s"TOPCOUNT must plan as TakeOrderedAndProject, got:\n$phys")
    val bottom = Mdx.run(
      """SELECT {[Measures].[rev]} ON COLUMNS,
        | BOTTOMCOUNT({[fecha].[y].Members}, 2, [Measures].[rev]) ON ROWS
        |FROM [orders]""".stripMargin, catalog, schema)
    val wantBottom = wide.groupBy("y")
      .agg(sum(col("price").cast("decimal(18,2)")).cast("double").as("rev"))
      .orderBy(col("rev").asc_nulls_last, col("y").asc_nulls_first)
      .limit(2).select("y", "rev")
    assert(bottom.collect().map(_.toSeq).toSeq ===
      wantBottom.collect().map(_.toSeq).toSeq)
  }

  test("ORDER sorts, FILTER prunes by a gated condition; they compose innermost-first over calc members") {
    val got = Mdx.run(
      """WITH MEMBER [Measures].[rev_per] AS
        | 'round([Measures].[rev] / [Measures].[n], 2)'
        |SELECT {[Measures].[n], [Measures].[rev_per]} ON COLUMNS,
        | ORDER(FILTER({[estado].[status].Members},
        |              '[Measures].[n] > 100'),
        |       [Measures].[rev_per], BDESC) ON ROWS
        |FROM [orders]""".stripMargin, catalog, schema)
    val base = wide.groupBy("status").agg(measures.head, measures.tail: _*)
      .select(col("status"), col("n"),
        round(col("rev") / col("n"), 2).as("rev_per"))
    val want = base.filter(col("n") > 100)
      .orderBy(col("rev_per").desc, col("status").asc_nulls_first)
      .select("status", "n", "rev_per")
    assert(got.collect().map(_.toSeq).toSeq ===
      want.collect().map(_.toSeq).toSeq)
    assert(got.count() > 0)
    // the gate covers set-function expressions too — untrusted text
    val e = intercept[IllegalArgumentException] {
      Mdx.run(
        """SELECT {[Measures].[n]} ON COLUMNS,
          | FILTER({[estado].[status].Members},
          |   'reflect("java.lang.System", "getProperty", "a") = "b"')
          |  ON ROWS
          |FROM [orders]""".stripMargin, catalog, schema)
    }
    assert(e.getMessage.contains("'reflect'"))
    // quoted-expression measure argument works in TOPCOUNT too
    val quoted = Mdx.run(
      """SELECT {[Measures].[n]} ON COLUMNS,
        | TOPCOUNT({[fecha].[y].Members}, 3,
        |          '[Measures].[rev] / [Measures].[n]') ON ROWS
        |FROM [orders]""".stripMargin, catalog, schema)
    assert(quoted.count() === 3)
  }

  test("DRILLTHROUGH returns the fact rows behind ONE cell: typed coordinates, RETURN projection, MAXROWS cap") {
    val got = Mdx.run(
      """DRILLTHROUGH
        |SELECT {[Measures].[n]} ON COLUMNS,
        | {[fecha].[y].[1996]} ON ROWS
        |FROM [orders]
        |WHERE ([estado].[status].[F])
        |RETURN [y], [status], [price]""".stripMargin, catalog, schema)
    val want = wide.filter(col("y") === 1996 && col("status") === "F")
      .select("y", "status", "price")
    assert(sortedRows(got) === sortedRows(want))
    assert(got.count() > 0)
    // no RETURN → every fact column; MAXROWS caps the row count
    val capped = Mdx.run(
      """DRILLTHROUGH MAXROWS 7
        |SELECT {[Measures].[n]} ON COLUMNS,
        | {[fecha].[y].[1996]} ON ROWS
        |FROM [orders]""".stripMargin, catalog, schema)
    assert(capped.columns.toSeq === wide.columns.toSeq)
    assert(capped.count() === 7)
    // the one-cell contract and the typed-coordinate rules are loud
    def bad(mdx: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Mdx.run(mdx, catalog, schema)
      }
      assert(e.getMessage.contains(needle),
        s"want '$needle' in: ${e.getMessage}")
    }
    bad("""DRILLTHROUGH SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].Members} ON ROWS FROM [orders]""".stripMargin,
      "use a [member] literal")
    bad("""DRILLTHROUGH SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].[1996], [estado].[status].[F]} ON ROWS
          |FROM [orders]""".stripMargin,
      "single member tuple")
    bad("""DRILLTHROUGH SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].[1996]} ON ROWS FROM [orders]
          |WHERE ([fecha].[y].[1997])""".stripMargin,
      "duplicate cell coordinate")
    bad("""DRILLTHROUGH SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].[1996]} ON ROWS FROM [orders]
          |RETURN [nope]""".stripMargin,
      "RETURN column '[nope]'")
    bad("""DRILLTHROUGH SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].[abc]} ON ROWS FROM [orders]""".stripMargin,
      "does not cast")
    bad("""DRILLTHROUGH MAXROWS 0 SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].[1996]} ON ROWS FROM [orders]""".stripMargin,
      "MAXROWS must be positive")
  }

  test("calc member names collide case-insensitively (withColumn would silently replace)") {
    val e = intercept[IllegalArgumentException] {
      Mdx.run(
        """WITH MEMBER [Measures].[N] AS '1 + 1'
          |SELECT {[Measures].[N]} ON COLUMNS,
          | {[estado].[status].Members} ON ROWS
          |FROM [orders]""".stripMargin, catalog, schema)
    }
    assert(e.getMessage.contains("collides"))
  }

  test("everything outside the subset is refused loudly, never mis-served") {
    def bad(mdx: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Mdx.run(mdx, catalog, schema)
      }
      assert(e.getMessage.contains(needle),
        s"want '$needle' in: ${e.getMessage}")
    }
    // unknown cube / hierarchy / level / measure are named
    bad("""SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].Members} ON ROWS FROM [nope]""".stripMargin,
      "not in the catalog")
    bad("""SELECT {[Measures].[n]} ON COLUMNS,
          | {[tiempo].[y].Members} ON ROWS FROM [orders]""".stripMargin,
      "hierarchy '[tiempo]'")
    bad("""SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[week].Members} ON ROWS FROM [orders]""".stripMargin,
      "level '[week]'")
    bad("""SELECT {[Measures].[margin]} ON COLUMNS,
          | {[fecha].[y].Members} ON ROWS FROM [orders]""".stripMargin,
      "measure(s) [margin]")
    // a level path with a bare third segment is neither .Members nor
    // a [member] literal
    bad("""SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].foo} ON ROWS FROM [orders]""".stripMargin,
      "expected .Members or a [member] literal")
    // member literals in a set UNION would need a per-set gid
    // discriminator — outside the subset
    bad("""SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].[1996], [estado].[status].Members} ON ROWS
          |FROM [orders]""".stripMargin,
      "single-set axis")
    // set functions and NON EMPTY are ROWS-axis features
    bad("""SELECT TOPCOUNT({[Measures].[n]}, 3, [Measures].[n])
          | ON COLUMNS, {[fecha].[y].Members} ON ROWS
          |FROM [orders]""".stripMargin,
      "must be hierarchy level sets")
    bad("""SELECT NON EMPTY {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].Members} ON ROWS FROM [orders]""".stripMargin,
      "NON EMPTY applies to the ROWS axis")
    // a set function inside a CROSSJOIN operand has no defined
    // measure context in this subset
    bad("""SELECT {[Measures].[n]} ON COLUMNS,
          | CROSSJOIN(TOPCOUNT({[fecha].[y].Members}, 2, [Measures].[n]),
          |           {[estado].[status].Members}) ON ROWS
          |FROM [orders]""".stripMargin,
      "not a CROSSJOIN operand")
    // TOPCOUNT's count must be a positive literal
    bad("""SELECT {[Measures].[n]} ON COLUMNS,
          | TOPCOUNT({[fecha].[y].Members}, 0, [Measures].[n]) ON ROWS
          |FROM [orders]""".stripMargin,
      "must be positive")
    // FILTER's condition must be quoted (the WITH MEMBER convention)
    bad("""SELECT {[Measures].[n]} ON COLUMNS,
          | FILTER({[fecha].[y].Members}, [Measures].[n]) ON ROWS
          |FROM [orders]""".stripMargin,
      "quoted expression")
    // missing axes are named
    bad("SELECT {[Measures].[n]} ON COLUMNS FROM [orders]",
      "missing ROWS axis")
    bad("SELECT {[fecha].[y].Members} ON ROWS FROM [orders]",
      "missing COLUMNS axis")
    // mixing measures and levels in one set
    bad("""SELECT {[Measures].[n], [fecha].[y].Members} ON COLUMNS,
          | {[fecha].[y].Members} ON ROWS FROM [orders]""".stripMargin,
      "cannot mix")
    // trailing garbage is not silently ignored
    bad("""SELECT {[Measures].[n]} ON COLUMNS,
          | {[fecha].[y].Members} ON ROWS FROM [orders] LIMIT""".stripMargin,
      "trailing content")
  }
}
