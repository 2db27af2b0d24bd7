package graft.features

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val customer = TestSpark.table("customer")

  test("randomSplit is seeded-deterministic and partitions the data") {
    val (tr1, te1) = Features.randomSplit(customer, 0.2, 42)
    val (tr2, te2) = Features.randomSplit(customer, 0.2, 42)
    assert(tr1.count() === tr2.count() && te1.count() === te2.count())
    assert(tr1.count() + te1.count() === customer.count())
  }

  test("stratifiedSplit keeps all classes in train") {
    val (tr, te) = Features.stratifiedSplit(customer, "c_mktsegment", 0.2, 42)
    assert(tr.count() + te.count() === customer.count())
    val classes = customer.select("c_mktsegment").distinct().count()
    assert(tr.select("c_mktsegment").distinct().count() === classes)
  }

  test("stratifiedSplit partitions cleanly even on nondeterministic lineage") {
    // repartition by rand(): every recompute of this lineage shuffles
    // rows differently — the exact hazard that made unpinned
    // monotonically_increasing_id rows land in both splits or neither
    val destabilized = customer.repartition(8, rand())
    val total = customer.count()
    for (round <- 1 to 2) {
      val (tr, te) = Features.stratifiedSplit(destabilized, "c_mktsegment", 0.3, 7)
      val trK = tr.select("c_custkey")
      val teK = te.select("c_custkey")
      assert(trK.intersect(teK).count() === 0L, s"round $round: overlap")
      assert(trK.count() + teK.count() === total, s"round $round: lost rows")
      assert(trK.union(teK).distinct().count() === total,
        s"round $round: duplicate/missing keys")
    }
  }

  test("stratifiedSplitByKey: deterministic, disjoint, complete, near-fraction") {
    val (tr1, te1) = Features.stratifiedSplitByKey(customer, "c_custkey", 0.25, 42)
    val (tr2, te2) = Features.stratifiedSplitByKey(customer, "c_custkey", 0.25, 42)
    // pure function of the data: reruns draw the identical split
    assert(te1.select("c_custkey").exceptAll(te2.select("c_custkey")).count() === 0L)
    assert(tr1.count() === tr2.count())
    assert(tr1.count() + te1.count() === customer.count())
    assert(tr1.select("c_custkey").intersect(te1.select("c_custkey")).count() === 0L)
    val frac = te1.count().toDouble / customer.count()
    assert(frac > 0.15 && frac < 0.35, s"test frac $frac")
    // a different seed draws a different split
    val (_, te3) = Features.stratifiedSplitByKey(customer, "c_custkey", 0.25, 43)
    assert(te3.select("c_custkey").exceptAll(te1.select("c_custkey")).count() > 0L)
  }

  test("madOutliers: planted outlier flagged, zero-MAD group yields null scores") {
    // group g: median 10, MAD = median(|x-10|) = 1; the 100 scores 90 MADs
    val df = Seq(("g", 9.0), ("g", 10.0), ("g", 11.0), ("g", 10.0), ("g", 100.0),
      ("z", 5.0), ("z", 5.0), ("z", 5.0)) // constant group: MAD 0
      .toDF("k", "v")
    val out = Features.madOutliers(df, "k", "v", k = 4.0)
    val flagged = out.filter(col("is_outlier")).collect()
    assert(flagged.length === 1 && flagged.head.getDouble(1) === 100.0)
    val z = out.filter(col("k") === "z").collect()
    assert(z.forall(r => r.isNullAt(r.fieldIndex("mad_score"))))
    assert(z.forall(!_.getBoolean(3))) // zero-MAD rows are not flagged
    assert(out.count() === 8) // row-preserving
  }

  test("cusumDeviation: flat series stays near zero, level shift ramps") {
    // flat 10,10,10,10 → cusum 0 everywhere; shift 0,0,10,10 (μ=5)
    // → cusum −5, −10, −5, 0: the ramp peaks AT the changepoint
    val df = Seq(("f", 1L, 10.0), ("f", 2L, 10.0), ("f", 3L, 10.0), ("f", 4L, 10.0),
      ("s", 1L, 0.0), ("s", 2L, 0.0), ("s", 3L, 10.0), ("s", 4L, 10.0))
      .toDF("k", "sec", "v")
    val out = Features.cusumDeviation(df, "k", "sec", "sec", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        r.getDecimal(r.fieldIndex("cusum")).doubleValue()).toMap
    Seq(1L, 2L, 3L, 4L).foreach(i => assert(out(("f", i)) === 0.0))
    assert(out(("s", 1L)) === -5.0 && out(("s", 2L)) === -10.0)
    assert(out(("s", 3L)) === -5.0 && out(("s", 4L)) === 0.0)
  }

  test("timeWeightedAvg: durations weight values; last observation drops") {
    // series s: v=10 holds 2s, v=20 holds 8s, final v=99 has no duration
    // twap = (10*2 + 20*8) / 10 = 18
    val df = Seq(("s", 0L, 1L, 10.0), ("s", 2L, 2L, 20.0), ("s", 10L, 3L, 99.0),
      ("t", 0L, 4L, 7.0), ("t", 5L, 5L, 7.0), ("t", 6L, 6L, 1.0))
      .toDF("k", "sec", "id", "v")
    val r = Features.timeWeightedAvg(df, "k", "sec", "id", "v")
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r("s") === ((2L, 18.0)))
    // t: 7 for 5s, 7 for 1s → 7.0 regardless of spacing
    assert(r("t") === ((2L, 7.0)))
    // chunked lead stitches boundaries exactly: chunk width 3 puts the
    // s-series rows in chunks 0|0|3 and t in 0|1|2 — every duration
    // crosses or touches a chunk edge, results must not move
    val c = Features.timeWeightedAvg(df, "k", "sec", "id", "v",
        chunkSeconds = 3L)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(c === r)
  }

  test("resampleLinear and cusumDeviation: chunked paths bit-identical on the events fixture") {
    val e = graft.Tables.events(spark, TestSpark.sf)
      .select($"event_type", unix_timestamp($"ts").as("sec"),
        $"event_id", $"value")
    // resample over daily-max observations (the q111 shape)
    val obs = e.groupBy($"event_type",
        (expr("sec DIV 86400") * 86400L).as("t"))
      .agg(max($"value").as("v"))
    def resample(chunk: Long) =
      Features.resampleLinear(obs, "event_type", "t", "v", step = 21600L,
          chunkSeconds = chunk)
        .orderBy("event_type", "grid_ts")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    assert(resample(86400L * 7) === resample(0L))
    assert(resample(100000L) === resample(0L))
    // cusum: two-phase regrouping of exact decimals must not move a bit
    def cusum(chunk: Long) =
      Features.cusumDeviation(e, "event_type", "sec", "event_id", "value",
          chunkSeconds = chunk)
        .orderBy("event_type", "sec", "event_id")
        .select($"event_type", $"event_id", $"cusum")
        .collect().map(r => (r.getString(0), r.getLong(1),
          Option(r.getDecimal(2)).map(_.toPlainString)))
        .toSeq
    assert(cusum(86400L) === cusum(0L))
    assert(cusum(604800L) === cusum(0L))
  }

  test("forwardFillChunked: bit-identical to forwardFill, incl. all-null chunks") {
    // key "s": values at t=0,1 then a LONG null run spanning several
    // chunks (chunk width 2 → chunks 2,3 are ALL-null; their rows
    // must still adopt the t=1 value), then a new value at t=9
    val df = Seq(
      ("s", 0L, 1L, Some(1.0)), ("s", 1L, 2L, Some(2.0)),
      ("s", 4L, 3L, None), ("s", 5L, 4L, None),
      ("s", 6L, 5L, None), ("s", 7L, 6L, None),
      ("s", 9L, 7L, Some(9.0)), ("s", 10L, 8L, None),
      ("t", 0L, 9L, None), ("t", 3L, 10L, Some(3.0))) // leading nulls stay null
      .toDF("k", "ts", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) = d
      .orderBy("k", "ts")
      .select("k", "ts", "f")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSeq
    val exact = run(Features.forwardFill(df, "k", Seq("ts", "id"), "v", "f"))
    val chunked = run(Features.forwardFillChunked(
      df, "k", "ts", "id", "v", "f", chunkSeconds = 2L))
    assert(chunked === exact)
    assert(exact.filter(_._1 == "s").map(_._3) ===
      Seq(Some(1.0), Some(2.0), Some(2.0), Some(2.0), Some(2.0),
        Some(2.0), Some(9.0), Some(9.0)))
    // fixture parity: fill value gaps per event_type over raw events
    val e = graft.Tables.events(spark, TestSpark.sf)
      .select($"event_type", unix_timestamp($"ts").as("sec"),
        $"event_id", $"value")
    def runE(d: org.apache.spark.sql.DataFrame) = d
      .orderBy("event_type", "sec", "event_id")
      .select("event_type", "event_id", "f")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSeq
    val ee = runE(Features.forwardFill(
      e, "event_type", Seq("sec", "event_id"), "value", "f"))
    assert(runE(Features.forwardFillChunked(
      e, "event_type", "sec", "event_id", "value", "f", 86400L)) === ee)
    assert(runE(Features.forwardFillChunked(
      e, "event_type", "sec", "event_id", "value", "f", 7L)) === ee)
  }

  test("timeWeightedAvg: chunked path is bit-identical on the events fixture") {
    val e = graft.Tables.events(spark, TestSpark.sf)
      .select($"event_type", unix_timestamp($"ts").as("sec"),
        $"event_id", $"value")
    def run(chunk: Long) =
      Features.timeWeightedAvg(e, "event_type", "sec", "event_id", "value",
          chunkSeconds = chunk)
        .orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    // several chunk widths, including one narrower than typical gaps
    // (most chunks hold 0-1 rows → nearly every lead crosses an edge)
    assert(run(86400L) === run(0L))
    assert(run(3600L) === run(0L))
    assert(run(7L) === run(0L))
  }

  test("ChunkAuto: probe picks the path, results and schema never move") {
    val e = graft.Tables.events(spark, TestSpark.sf)
      .select($"event_type", unix_timestamp($"ts").as("sec"),
        $"event_id", $"value")
    // small fixture: the probe must keep the single-window path
    assert(Features.autoChunkWidth(e, "event_type", $"sec") === 0L)
    // tiny thresholds force the probe down the chunked branch: the
    // width it derives must itself be bit-identical to unchunked
    val w = Features.autoChunkWidth(e, "event_type", $"sec",
      maxRowsPerSeries = 10L, targetChunkRows = 5L)
    assert(w > 0L)
    def twap(chunk: Long) =
      Features.timeWeightedAvg(e, "event_type", "sec", "event_id", "value",
          chunkSeconds = chunk)
        .orderBy("event_type")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    assert(twap(w) === twap(0L))
    // the DEFAULT call (no knob) routes through the probe and matches
    assert(twap(Features.ChunkAuto) === twap(0L))
    // cusum: both paths must agree on VALUES and on the column's
    // DECIMAL type — auto flips paths on data, so a schema divergence
    // would be a silent downstream break
    def cusum(chunk: Long) =
      Features.cusumDeviation(e, "event_type", "sec", "event_id", "value",
        chunkSeconds = chunk)
    assert(cusum(0L).schema("cusum").dataType ===
      cusum(86400L).schema("cusum").dataType)
    assert(cusum(Features.ChunkAuto).schema("cusum").dataType ===
      cusum(0L).schema("cusum").dataType)
    // empty input: probe returns 0, no throw
    assert(Features.autoChunkWidth(e.filter(lit(false)), "event_type",
      $"sec") === 0L)
  }

  test("forwardFillTs: auto entry matches forwardFill, column order stable") {
    val e = graft.Tables.events(spark, TestSpark.sf)
      .select($"event_type", unix_timestamp($"ts").as("sec"),
        $"event_id", $"value")
    def run(d: org.apache.spark.sql.DataFrame) = d
      .orderBy("event_type", "sec", "event_id")
      .select("event_type", "event_id", "f")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSeq
    val exact = run(Features.forwardFill(
      e, "event_type", Seq("sec", "event_id"), "value", "f"))
    val auto = Features.forwardFillTs(
      e, "event_type", "sec", "event_id", "value", "f")
    val forced = Features.forwardFillTs(
      e, "event_type", "sec", "event_id", "value", "f", chunkSeconds = 7L)
    assert(run(auto) === exact)
    assert(run(forced) === exact)
    // whichever path ran, the contract is (input columns, outCol)
    assert(auto.columns.toSeq === e.columns.toSeq :+ "f")
    assert(forced.columns.toSeq === e.columns.toSeq :+ "f")
  }

  test("timeSplitByQuantile splits near the requested fraction") {
    val orders = TestSpark.table("orders")
      .withColumn("ep", unix_timestamp($"o_orderdate").cast("double"))
    val (tr, te) = Features.timeSplitByQuantile(orders, "ep", 0.8)
    val frac = tr.count().toDouble / orders.count()
    assert(frac > 0.7 && frac < 0.9, s"train frac $frac")
    // no time overlap
    val maxTr = tr.agg(max($"ep")).head.getDouble(0)
    val minTe = te.agg(min($"ep")).head.getDouble(0)
    assert(maxTr <= minTe)
  }

  test("classWeights: weighted total equals class count") {
    val w = Features.classWeights(TestSpark.table("embeddings"), "label")
    // sum over classes of n * weight = total, so sum of weights*n/total = 1 per class avg
    val total = TestSpark.table("embeddings").count().toDouble
    val sumWeighted = w.select(sum($"n" * $"weight")).head.getDouble(0)
    assert(math.abs(sumWeighted - total) < 1e-6)
  }

  test("imputeMean fills nulls with the column mean") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    val out = Features.imputeMean(df, "x").collect().map(_.getDouble(0))
    assert(out.toSeq === Seq(1.0, 2.0, 3.0))
  }

  test("imputeMode fills nulls with the most frequent value") {
    val df = Seq(Some("a"), Some("b"), Some("a"), None).toDF("x")
    val out = Features.imputeMode(df, "x").collect().map(_.getString(0))
    assert(out.toSeq === Seq("a", "b", "a", "a"))
  }

  test("standardize yields ~zero mean, unit variance") {
    val out = Features.standardize(customer, Seq("c_acctbal"))
    val stats = out.agg(avg($"c_acctbal_z"), stddev_samp($"c_acctbal_z")).head
    assert(math.abs(stats.getDouble(0)) < 1e-9)
    assert(math.abs(stats.getDouble(1) - 1.0) < 1e-9)
  }

  test("labelEncoding: most frequent gets 0, dense ids") {
    val df = Seq("a", "b", "b", "c", "b", "a").toDF("x")
    val enc = Features.labelEncoding(df, "x").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(enc === Map("b" -> 0L, "a" -> 1L, "c" -> 2L))
  }

  test("labelEncoding ranks a 10^6-distinct vocabulary without a global window") {
    val big = spark.range(1000000).selectExpr("CAST(id AS STRING) AS x")
    val enc = Features.labelEncoding(big, "x")
    // plan-asserted: the rank is the two-phase distributed form, not a
    // single-task global window over the corpus-sized vocabulary
    val lint = graft.plans.PlanLint.check(enc)
    assert(!lint.exists(_.startsWith("GLOBAL_WINDOW")), lint.mkString("; "))
    // and the ids are exactly the dense range 0..N-1 (offsets correct,
    // no rank collides across partitions)
    val stats = enc.agg(count(lit(1)), min(col("label_idx")),
      max(col("label_idx")), count_distinct(col("label_idx"))).head()
    assert(stats.getLong(0) === 1000000L)
    assert(stats.getLong(1) === 0L && stats.getLong(2) === 999999L)
    assert(stats.getLong(3) === 1000000L)
  }

  test("winsorize approx strategy: routed, stable, fences within rank tolerance") {
    import Features.PercentileStrategy
    val li = TestSpark.table("lineitem")
      .select(col("l_extendedprice").cast("double").as("v"))
    val acc = 10000
    val run1 = Features.winsorize(li, "v", 0.05, 0.95, "clipped",
      strategy = PercentileStrategy.Approx(acc))
    // the strategy actually routes to the sketch, not percentile_cont
    val plan = run1.queryExecution.optimizedPlan.toString
    assert(plan.contains("approx_percentile") && !plan.contains("percentile_cont"))
    // fences = min/max of the clipped column (5%/95% fences bind here)
    val f1 = run1.agg(min(col("clipped")), max(col("clipped"))).head()
    val f2 = Features.winsorize(li, "v", 0.05, 0.95, "clipped",
        strategy = PercentileStrategy.Approx(acc))
      .agg(min(col("clipped")), max(col("clipped"))).head()
    assert(f1 === f2, "approx fences must be rerun-stable")
    // declared contract: the fence is an OBSERVED value whose rank is
    // within n/accuracy of the target. With duplicate prices the
    // strictly-below count undershoots the fence's rank by its tie
    // multiplicity, so bracket the target between < and <= counts.
    val n = li.count()
    val tol = n.toDouble / acc + 1
    val lo = f1.getDouble(0); val hi = f1.getDouble(1)
    val below = li.filter(col("v") < lo).count()
    val belowEq = li.filter(col("v") <= lo).count()
    val above = li.filter(col("v") > hi).count()
    val aboveEq = li.filter(col("v") >= hi).count()
    assert(below <= 0.05 * n + tol && belowEq >= 0.05 * n - tol,
      s"lo fence rank off: <$lo=$below <=$lo=$belowEq of $n")
    assert(above <= 0.05 * n + tol && aboveEq >= 0.05 * n - tol,
      s"hi fence rank off: >$hi=$above >=$hi=$aboveEq of $n")
  }

  test("madOutliers approx strategy: routed, rerun-stable, flags agree with exact") {
    import Features.PercentileStrategy
    val li = TestSpark.table("lineitem").select(col("l_returnflag").as("g"),
      col("l_extendedprice").cast("double").as("v"))
    val approx = Features.madOutliers(li, "g", "v", k = 4.0,
      strategy = PercentileStrategy.Approx(10000))
    val plan = approx.queryExecution.optimizedPlan.toString
    assert(plan.contains("approx_percentile") && !plan.contains("percentile_cont"))
    val c1 = approx.filter(col("is_outlier")).count()
    val c2 = Features.madOutliers(li, "g", "v", k = 4.0,
        strategy = PercentileStrategy.Approx(10000))
      .filter(col("is_outlier")).count()
    assert(c1 === c2, "approx flags must be rerun-stable")
    // at this accuracy the approx flags track the exact ones closely
    val exact = Features.madOutliers(li, "g", "v", k = 4.0)
      .filter(col("is_outlier")).count()
    assert(math.abs(c1 - exact) <= math.max(2L, exact / 20),
      s"approx flagged $c1 vs exact $exact")
  }

  test("ExactRank strategy is bit-identical to Exact across the quantile family") {
    import Features.PercentileStrategy.{Exact, ExactRank}
    val li = TestSpark.table("lineitem").select(col("l_returnflag").as("g"),
      col("l_extendedprice").cast("double").as("v"),
      col("l_orderkey"), col("l_linenumber"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // per-group winsorize fences and clips
    assert(rows(Features.winsorizeByGroup(li, "g", "v", 0.1, 0.9, "c",
        strategy = ExactRank)) ===
      rows(Features.winsorizeByGroup(li, "g", "v", 0.1, 0.9, "c",
        strategy = Exact)))
    // global winsorize
    assert(rows(Features.winsorize(li, "v", 0.05, 0.95, "c",
        strategy = ExactRank)) ===
      rows(Features.winsorize(li, "v", 0.05, 0.95, "c", strategy = Exact)))
    // MAD scores and flags (two chained medians)
    assert(rows(Features.madOutliers(li, "g", "v", k = 3.0,
        strategy = ExactRank)) ===
      rows(Features.madOutliers(li, "g", "v", k = 3.0, strategy = Exact)))
    // quantile bin assignment
    assert(rows(Features.quantileBins(li, "v", b = 5, strategy = ExactRank)) ===
      rows(Features.quantileBins(li, "v", b = 5, strategy = Exact)))
  }

  test("ExactRank interpolates exactly like percentile_cont on tiny fixtures") {
    // even count: p50 of [1,2,3,10] = 2.5; p25 = 1 + 0.75*(2-1) = 1.75
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0),
      ("b", 5.0), ("b", 7.0), ("b", 9.0)).toDF("g", "v")
    val r = Features.groupPercentilesRank(df, "g", col("v"),
        Seq(0.25 -> "p25", 0.5 -> "p50"))
      .collect().map(x => x.getString(0) -> ((x.getDouble(1), x.getDouble(2))))
      .toMap
    assert(r("a") === ((1.75, 2.5)))
    assert(r("b") === ((6.0, 7.0)))
    // singleton group: every percentile is the value itself
    val one = Features.groupPercentilesRank(
      Seq(("x", 42.0)).toDF("g", "v"), "g", col("v"),
      Seq(0.0 -> "p0", 0.37 -> "p37", 1.0 -> "p100")).head()
    assert(one.getDouble(1) === 42.0 && one.getDouble(2) === 42.0 &&
      one.getDouble(3) === 42.0)
  }

  test("ExactRank: all-null and null-keyed groups agree with Exact") {
    import Features.PercentileStrategy.{Exact, ExactRank}
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(9.0)),
      ("c", None), ("c", None)).toDF("g", "v")
      .unionByName(Seq((null.asInstanceOf[String], Some(5.0)),
        (null.asInstanceOf[String], Some(6.0))).toDF("g", "v"))
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
    // group c (all null values) keeps its rows, null clip/score; the
    // null GROUP KEY is a real group under both strategies
    assert(rows(Features.winsorizeByGroup(df, "g", "v", 0.25, 0.75, "c2",
        strategy = ExactRank)) ===
      rows(Features.winsorizeByGroup(df, "g", "v", 0.25, 0.75, "c2",
        strategy = Exact)))
    assert(rows(Features.madOutliers(df, "g", "v", k = 2.0,
        strategy = ExactRank)) ===
      rows(Features.madOutliers(df, "g", "v", k = 2.0, strategy = Exact)))
    // and not merely equal-but-both-wrong: the null-keyed group's
    // fences must actually REACH its rows (null-safe join-back) —
    // null group = {5.0, 6.0}, p25/p75 = (5.25, 5.75), so 5.0 clips up
    val nullRows = Features.winsorizeByGroup(df, "g", "v", 0.25, 0.75, "c2",
        strategy = Exact)
      .filter(col("g").isNull).select("v", "c2").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(nullRows(5.0) === 5.25 && nullRows(6.0) === 5.75, nullRows.toString)
    val nullScores = Features.madOutliers(df, "g", "v", k = 2.0)
      .filter(col("g").isNull).select("mad_score").collect()
    assert(nullScores.nonEmpty && nullScores.forall(!_.isNullAt(0)),
      "null-keyed rows must receive their group's med/mad")
  }

  test("ExactRank plans: no percentile_cont buffering, no single-task rank window") {
    import Features.PercentileStrategy.ExactRank
    val li = TestSpark.table("lineitem").select(col("l_returnflag").as("g"),
      col("l_extendedprice").cast("double").as("v"))
    val out = Features.winsorizeByGroup(li, "g", "v", 0.1, 0.9, "c",
      strategy = ExactRank)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("percentile_cont") && !plan.contains("percentile("))
    val lint = graft.plans.PlanLint.check(out)
    assert(!lint.exists(_.startsWith("GLOBAL_WINDOW")), lint.mkString("; "))
  }

  test("quantileBins approx strategy produces near-equal buckets, stable") {
    import Features.PercentileStrategy
    val orders = TestSpark.table("orders")
    val binned = Features.quantileBins(orders, "o_totalprice", b = 4,
      strategy = PercentileStrategy.Approx(10000))
    val sizes = binned.groupBy(col("bin")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === Set(0L, 1L, 2L, 3L))
    val n = orders.count().toDouble
    sizes.values.foreach(s =>
      assert(math.abs(s - n / 4) <= n / 100 + 4, s"bucket sizes: $sizes"))
  }

  test("rankNormalize matches percent_rank semantics incl. ties and null pass-through") {
    val df = Seq(("a", Some(10.0)), ("a", Some(20.0)), ("a", Some(20.0)),
      ("a", Some(30.0)), ("b", Some(5.0)), ("b", None)).toDF("g", "v")
    val out = Features.rankNormalize(df, "g", "v").collect()
      .map(r => (r.getString(0), Option(r.get(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // a: n=4 → 10→0/3, 20 (tie, min rank 2) → 1/3 both, 30 → 3/3
    val aRanks = out.filter(_._1 == "a").map(x => x._2.get -> x._3.get).toMap
    assert(aRanks(10.0) === 0.0)
    assert(math.abs(aRanks(20.0) - 1.0 / 3) < 1e-15)
    assert(aRanks(30.0) === 1.0)
    assert(out.count { case (g, v, _) => g == "a" && v.contains(20.0) } === 2)
    // singleton group → 0; null value → null rank, row kept
    assert(out.filter(_._1 == "b").flatMap(_._3).toSeq === Seq(0.0))
    assert(out.exists { case (g, v, r) => g == "b" && v.isEmpty && r.isEmpty })
    // plan: no global single-task window
    val lint = graft.plans.PlanLint.check(Features.rankNormalize(df, "g", "v"))
    assert(!lint.exists(_.startsWith("GLOBAL_WINDOW")), lint.mkString("; "))
  }

  test("budgetMixSample: quota fill, boundary overshoot, unlisted domains drop") {
    val docs = Seq(
      ("a", 1L, 60L), ("a", 2L, 60L), ("a", 3L, 60L),
      ("b", 10L, 25L), ("b", 11L, 25L),
      ("x", 99L, 5L) // unlisted domain
    ).toDF("dom", "id", "cost")
    val out = Features.budgetMixSample(docs, "dom", "id", "cost",
      Map("a" -> 0.75, "b" -> 0.25), budget = 200L)
    val byDom = out.groupBy($"dom")
      .agg(count(lit(1)).as("n"), sum($"cost").as("c"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // quota(a)=150: two 60-cost docs fill 120 < 150, the third starts
    // under quota and overshoots — greedy fill keeps it (n=3)
    assert(byDom("a") === ((3L, 180L)), byDom.toString)
    // quota(b)=50: both 25-cost docs fit exactly (cum 0, 25 < 50)
    assert(byDom("b") === ((2L, 50L)))
    assert(!byDom.contains("x"), "unlisted domain must drop")
    // deterministic: identical selection on rerun
    val again = Features.budgetMixSample(docs, "dom", "id", "cost",
      Map("a" -> 0.75, "b" -> 0.25), budget = 200L)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(again === out.select($"id").collect().map(_.getLong(0)).toSet)
  }

  test("topKPerGroup returns at most k per group in order") {
    val top = Features.topKPerGroup(TestSpark.table("lineitem"), "l_orderkey",
      Seq($"l_extendedprice".desc, $"l_linenumber".asc), 2)
    val counts = top.groupBy("l_orderkey").count().agg(max("count")).head.getLong(0)
    assert(counts <= 2)
  }

  test("groupedSample is seeded-deterministic") {
    val a = Features.groupedSample(TestSpark.table("lineitem"), "l_returnflag", 5, 42)
      .select("l_orderkey", "l_linenumber").collect().toSet
    val b = Features.groupedSample(TestSpark.table("lineitem"), "l_returnflag", 5, 42)
      .select("l_orderkey", "l_linenumber").collect().toSet
    assert(a === b)
    assert(a.size === 15) // 3 flags x 5
  }

  test("classifyColumns partitions by dtype") {
    val (num, cat) = Features.classifyColumns(customer)
    assert(num.toSet === Set("c_custkey", "c_nationkey", "c_acctbal"))
    assert(cat.toSet === Set("c_name", "c_mktsegment"))
  }

  test("stratifiedSplit: null-bearing and duplicate rows land in exactly one split") {
    import spark.implicits._
    val df = (Seq.fill(6)(("a", Option.empty[Int])) ++
      (1 to 94).map(i => ("b", Some(i % 3))))
      .toDF("label", "feature")
    val (train, test) = Features.stratifiedSplit(df, "label", 0.2, seed = 7)
    assert(train.count() + test.count() === df.count(),
      "every row in exactly one split (no leakage, no loss)")
  }

  test("oneHot: exactly one flag set for known values, none for unknown") {
    import spark.implicits._
    val df = Seq("a", "b", "zzz", null).toDF("c")
    val out = Features.oneHot(df, "c", Seq("a", "b"))
      .collect().map(r => (Option(r.getString(0)),
        r.getAs[Int]("c_a"), r.getAs[Int]("c_b")))
    assert(out.toSet === Set(
      (Some("a"), 1, 0), (Some("b"), 0, 1), (Some("zzz"), 0, 0), (None, 0, 0)))
  }

  test("bounded_topk aggregate equals the collect_list formulation on lineitem") {
    val li = TestSpark.table("lineitem").limit(20000)
    val key = struct(negate($"l_extendedprice").as("np"),
      $"l_linenumber".as("l_linenumber"))
    val viaList = Features.topKPerGroupAgg(li, "l_orderkey", key, 2)
      .select("l_orderkey", "l_linenumber", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaHeap = Features.topKPerGroupBounded(li, "l_orderkey", key, 2)
      .select("l_orderkey", "l_linenumber", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaHeap === viaList)
    assert(viaHeap.nonEmpty)
  }

  test("groupedSampleBounded equals the window-sort hash sample") {
    val docs = TestSpark.table("documents").select($"lang", $"doc_id")
    val viaHeap = Features.groupedSampleBounded(docs, "lang", "doc_id", 5)
      .select("lang", "doc_id", "rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaWindow = Features.groupedSampleHash(docs, "lang", "doc_id", 5)
    // groupedSampleHash drops the rank; recompute it for comparison
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string").cast("binary")), $"doc_id")
    val viaWindowRanked = viaWindow
      .withColumn("rn", row_number().over(w).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaHeap === viaWindowRanked)
    assert(viaHeap.nonEmpty)
  }

  test("resampleLinear: planted series interpolates exactly, one row per grid point") {
    // series a: obs at t=0 (v=0) and t=100 (v=10): grid step 25
    // series b: single obs ON grid; series c: single obs off grid
    val df = Seq(("a", 0L, 0.0), ("a", 100L, 10.0),
      ("b", 50L, 7.0), ("c", 33L, 1.0)).toDF("s", "t", "v")
    val got = Features.resampleLinear(df, "s", "t", "v", step = 25L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === Set(("a", 0L), ("a", 25L), ("a", 50L), ("a", 75L),
      ("a", 100L), ("b", 50L)))
    assert(got(("a", 0L)) === 0.0)
    assert(got(("a", 25L)) === 2.5)
    assert(got(("a", 75L)) === 7.5)
    assert(got(("a", 100L)) === 10.0) // last obs, on grid
    assert(got(("b", 50L)) === 7.0)
  }

  test("resampleLinear: observations between grid points interpolate through") {
    // obs at 10 and 40, step 20: grid point 20 interpolated from the pair
    val df = Seq(("s", 10L, 1.0), ("s", 40L, 4.0)).toDF("s", "t", "v")
    val got = Features.resampleLinear(df, "s", "t", "v", step = 20L)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // 20 from the pair interior; 40 is the on-grid last observation
    assert(got.keySet === Set(20L, 40L))
    assert(math.abs(got(20L) - 2.0) < 1e-12)
    assert(got(40L) === 4.0)
  }

  test("trendPerGroup: planted slopes recovered; degenerate groups null") {
    val rows =
      (0L to 10L).map(x => ("up", x, 2.0 * x + 5.0)) ++     // slope 2, icpt 5
      (0L to 10L).map(x => ("flat", x, 7.0)) ++             // slope 0, icpt 7
      Seq(("single", 3L, 9.0),                              // n=1 → null
        ("novar", 4L, 1.0), ("novar", 4L, 3.0))             // zero x-variance
    val got = Features.trendPerGroup(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got("up")._1 === 11L)
    assert(math.abs(got("up")._2.get.asInstanceOf[Double] - 2.0) < 1e-9)
    assert(math.abs(got("up")._3.get.asInstanceOf[Double] - 5.0) < 1e-9)
    assert(math.abs(got("flat")._2.get.asInstanceOf[Double]) < 1e-9)
    assert(got("single")._2 === None)
    assert(got("novar")._2 === None)
  }

  test("bounded_topk on a primitive column keeps the k smallest, sorted") {
    val df = Seq(("a", 5L), ("a", 1L), ("a", 3L), ("a", 2L), ("b", 9L))
      .toDF("g", "v")
    val got = df.groupBy($"g")
      .agg(graft.functions.bounded_topk($"v", 2).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") === Seq(1L, 2L))
    assert(got("b") === Seq(9L))
  }

  test("bounded_topk rejects unorderable child types at analysis time") {
    val df = Seq(("a", 1L)).toDF("g", "v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy($"g")
        .agg(graft.functions.bounded_topk(map($"g", $"v"), 2))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("order"), e.getMessage)
  }

  test("bounded_topk survives partial-aggregate serialization across many partitions") {
    val df = spark.range(0, 10000).repartition(32)
      .select(($"id" % 7).as("g"), $"id".as("v"))
    val got = df.groupBy($"g")
      .agg(graft.functions.bounded_topk($"v", 3).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    (0L until 7L).foreach { g =>
      assert(got(g) === Seq(g, g + 7, g + 14), s"group $g")
    }
  }

  test("equiWidthHistogram: bins partition [min,max], counts sum to n, top edge closes") {
    // values 0..99: bins of width 9.9; 99 (the max) must land in bin 9
    val df = (0 until 100).map(_.toDouble).toDF("x")
    val bins = Features.equiWidthHistogram(df, "x", bins = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
      .sortBy(_._1)
    assert(bins.map(_._3).sum === 100L)
    assert(bins.map(_._1) === (0L to 9L).toList)
    assert(bins.head._2 === 0.0)
    // 99/9.9 = 10 exactly → clamped into the last bin
    assert(bins.last._3 === 10L)
  }

  test("equiWidthHistogram: constant column degenerates to one bin") {
    val df = Seq.fill(5)(3.25).toDF("x")
    val bins = Features.equiWidthHistogram(df, "x", 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(bins.toSeq === Seq((0L, 3.25, 5L)))
  }

  test("equiWidthHistogram ignores nulls") {
    val df = Seq(Some(1.0), None, Some(2.0), None).toDF("x")
    assert(Features.equiWidthHistogram(df, "x", 2)
      .agg(sum($"cnt")).head.getLong(0) === 2L)
  }

  test("temperatureMixSample: quotas follow n^tau, draw is deterministic") {
    // domains: a=900, b=100, c=4 rows; tau=0.5, target=100
    // weights sqrt: 30, 10, 2 (sum 42) → quotas floor(100*w/42): 71, 23, 4
    val df = (
      (1 to 900).map(i => (s"k$i", "a")) ++
      (1001 to 1100).map(i => (s"k$i", "b")) ++
      (2001 to 2004).map(i => (s"k$i", "c"))).toDF("k", "d")
    val out = Features.temperatureMixSample(df, "d", "k", tau = 0.5, target = 100)
    val byDomain = out.groupBy($"d").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain === Map("a" -> 71L, "b" -> 23L, "c" -> 4L))
    // tau < 1 upweights the small domain vs proportional (c would get 0)
    val rerun = Features.temperatureMixSample(
      df.repartition(17), "d", "k", tau = 0.5, target = 100)
    assert(rerun.select("k").collect().map(_.getString(0)).sorted.toSeq ===
      out.select("k").collect().map(_.getString(0)).sorted.toSeq)
  }

  test("temperatureMixSample: tau=0 is uniform-by-domain, quota never exceeds domain size") {
    val df = ((1 to 50).map(i => (s"a$i", "a")) ++ Seq(("b1", "b"))).toDF("k", "d")
    val out = Features.temperatureMixSample(df, "d", "k", tau = 0.0, target = 10)
      .groupBy($"d").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // weights 1,1 → quota 5 each; domain b has only 1 row
    assert(out === Map("a" -> 5L, "b" -> 1L))
  }

  test("targetEncode: frequent category keeps its mean, rare one shrinks to prior") {
    // cat a: 40 rows mean 1.0; cat b: 1 row mean 0.0; prior = 40/41
    val df = (Seq.fill(40)(("a", 1)) ++ Seq(("b", 0))).toDF("c", "y")
    val m = Features.targetEncode(df, "c", "y", smoothing = 10.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("enc")).toMap
    val prior = 40.0 / 41.0
    assert(math.abs(m("a") - (40.0 + 10 * prior) / 50.0) < 1e-6)
    assert(math.abs(m("b") - (0.0 + 10 * prior) / 11.0) < 1e-6)
    assert(m("a") > m("b"))
    // b's single 0 shrinks most of the way back to the prior
    assert(m("b") > 0.8)
  }

  test("targetEncode: smoothing 0 is the raw per-category mean; null targets drop") {
    val df = Seq[(String, java.lang.Integer)](
      ("a", 1), ("a", 0), ("b", 1), ("b", null)).toDF("c", "y")
    val m = Features.targetEncode(df, "c", "y", smoothing = 0.0)
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"),
        r.getAs[Double]("enc"))).toList.sortBy(_._1)
    assert(m === List(("a", 2L, 0.5), ("b", 1L, 1.0)))
  }

  test("targetEncode: NULL category is its own mapping row") {
    val df = Seq[(String, java.lang.Integer)](
      (null, 1), (null, 1), ("a", 0)).toDF("c", "y")
    val rows = Features.targetEncode(df, "c", "y", smoothing = 0.0).collect()
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getAs[Long]("n") === 2L)
    assert(nullRow.getAs[Double]("enc") === 1.0)
  }
}
