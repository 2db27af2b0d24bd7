package graft.ml

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ari(pairs: Seq[(Int, Int)]): Double =
    Metrics.adjustedRandIndex(pairs.toDF("cluster", "label"), "cluster", "label")
      .head().getDouble(0)

  test("ARI: perfect agreement is 1.0, under any label permutation") {
    assert(ari(Seq((0, 0), (0, 0), (1, 1), (1, 1))) === 1.0)
    // ARI is permutation-invariant: relabeled clusters score identically
    assert(ari(Seq((1, 0), (1, 0), (0, 1), (0, 1))) === 1.0)
  }

  test("ARI: known sklearn values") {
    // adjusted_rand_score([0,0,1,1], [0,1,0,1]) == -0.5
    assert(ari(Seq((0, 0), (1, 0), (0, 1), (1, 1))) === -0.5)
    // adjusted_rand_score([0,0,1,2], [0,0,1,1]) == 0.571429 (4 dp: 0.5714)
    val v = ari(Seq((0, 0), (0, 0), (1, 1), (1, 2)))
    assert(math.abs(v - 0.571429) < 1e-6, s"got $v")
  }

  test("ARI: trivial partitions (denominator 0) return 1.0, null rows drop") {
    // everything in one cluster AND one label: sklearn convention 1.0
    assert(ari(Seq((0, 0), (0, 0), (0, 0))) === 1.0)
    val withNulls = Seq[(java.lang.Integer, java.lang.Integer)](
      (0, 0), (0, 0), (1, 1), (1, 1), (null, 0), (1, null))
      .toDF("cluster", "label")
    assert(Metrics.adjustedRandIndex(withNulls, "cluster", "label")
      .head().getDouble(0) === 1.0)
  }

  test("clusterWithAri recovers planted labels with ARI near 1") {
    // three well-separated blobs labeled by blob id
    val pts = for (b <- 0 until 3; i <- 0 until 40) yield
      (b, b * 100.0 + (i % 7) * 0.5, b * -50.0 + (i % 5) * 0.3)
    val df = pts.toDF("truth", "x", "y")
    val (res, a) = Drivers.clusterWithAri(df, Seq("x", "y"), k = 3, "truth")
    assert(res.sizes.values.sum === 120L)
    assert(a > 0.99, s"ARI $a")
  }

  test("rocPoints: exact counts and rates on a hand-checked fixture") {
    // scores: positives at 0.9, 0.8, 0.4; negatives at 0.7, 0.3, 0.1
    val df = Seq((1, 0.9), (1, 0.8), (1, 0.4), (0, 0.7), (0, 0.3), (0, 0.1))
      .toDF("label", "score")
    val pts = Metrics.rocPoints(df, "label", "score", Seq(0.5, 0.35, 0.05))
      .orderBy(desc("threshold")).collect()
    // t=0.5: tp=2 fp=1 → tpr .666667 fpr .333333
    assert(pts(0).getAs[Long]("tp") === 2L && pts(0).getAs[Long]("fp") === 1L)
    assert(pts(0).getAs[Double]("tpr") === 0.666667)
    // t=0.35: tp=3 fp=1 → tpr 1.0
    assert(pts(1).getAs[Long]("tp") === 3L && pts(1).getAs[Double]("tpr") === 1.0)
    // t=0.05: everything predicted positive
    assert(pts(2).getAs[Double]("tpr") === 1.0 && pts(2).getAs[Double]("fpr") === 1.0)
  }

  test("rocPointsPerClass: each class's curve equals the binarized rocPoints") {
    val df = Seq(
      ("a", 0.9, 0.1), ("a", 0.6, 0.5), ("b", 0.3, 0.8),
      ("b", 0.2, 0.7), ("a", 0.5, 0.4), ("b", 0.1, 0.9))
      .toDF("label", "s_a", "s_b")
    val ths = Seq(0.25, 0.55, 0.85)
    val multi = Metrics.rocPointsPerClass(df, "label",
        Seq("a" -> "s_a", "b" -> "s_b"), ths)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    for (cls <- Seq("a", "b")) {
      val bin = df.select(
        when(col("label") === cls, 1).otherwise(0).as("label"),
        col(s"s_$cls").as("score"))
      Metrics.rocPoints(bin, "label", "score", ths).collect().foreach { r =>
        val got = multi((cls, r.getDouble(0)))
        assert(got === ((r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))), s"class $cls t=${r.getDouble(0)}")
      }
    }
  }

  test("confusionMatrix is square over the class union, zero-filled") {
    // "c" appears only as a prediction, "a" never predicted
    val df = Seq(("a", "b"), ("a", "c"), ("b", "b"), ("b", "b"))
      .toDF("label", "pred")
    val m = Metrics.confusionMatrix(df, "label", "pred")
    assert(m.columns.toSeq === Seq("label", "a", "b", "c"))
    val rows = m.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows("a") === ((0L, 1L, 1L)))
    assert(rows("b") === ((0L, 2L, 0L)))
    assert(rows("c") === ((0L, 0L, 0L))) // hallucinated class: zero row
    assert(rows.size === 3)
  }

  test("confusionMatrix refuses a high-cardinality class domain (probe cap)") {
    // an ID-like column passed as a "class" must fail fast with a clear
    // message, not OOM the driver collecting its domain
    val idLike = spark.range(500)
      .selectExpr("CAST(id AS STRING) AS label", "CAST(id + 1 AS STRING) AS pred")
    val e = intercept[IllegalArgumentException] {
      Metrics.confusionMatrix(idLike, "label", "pred", maxClasses = 100)
    }
    assert(e.getMessage.contains("distinct classes"), e.getMessage)
    // tiny-class path unchanged under the default cap
    val tiny = Seq(("a", "b"), ("b", "b")).toDF("label", "pred")
    assert(Metrics.confusionMatrix(tiny, "label", "pred").count() === 2L)
  }

  test("rocPointsPerClass drops null-label rows, same contract as binary rocPoints") {
    // a null label must not count as a rest-class negative for every curve
    val df = Seq[(String, Double, Double)](
      ("a", 0.9, 0.1), ("b", 0.2, 0.8), (null, 0.99, 0.99))
      .toDF("label", "sa", "sb")
    // output schema: (class, threshold, tp, fp, tpr, fpr)
    val pts = Metrics.rocPointsPerClass(df, "label",
      Seq("a" -> "sa", "b" -> "sb"), Seq(0.5))
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // class a at t=0.5: tp=1 (the a row), fp=0 — the null row's 0.99
    // score must NOT appear as a false positive
    assert(pts("a") === ((1L, 0L)))
    assert(pts("b") === ((1L, 0L)))
  }

  test("calibrationBins: a perfectly calibrated score has pos_rate ≈ mean_score") {
    // 10 rows at score 0.25 with 25% positive; 8 at 0.75 with 75%
    val rows = (1 to 10).map(i => (if (i <= 25 * 10 / 100) 1 else 0, 0.25)) ++
      (1 to 8).map(i => (if (i <= 6) 1 else 0, 0.75))
    val out = Metrics.calibrationBins(rows.toDF("label", "score"), "label",
        "score", bins = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1L) === ((10L, 2L, 0.25, 0.2)))  // floor(25/100·4)=1
    assert(out(3L) === ((8L, 6L, 0.75, 0.75)))
    // out-of-range scores clamp into the edge bins
    val edge = Seq((1, -0.5), (0, 1.5)).toDF("label", "score")
    val bins = Metrics.calibrationBins(edge, "label", "score", 4)
      .collect().map(_.getLong(0)).toSet
    assert(bins === Set(0L, 3L))
  }

  test("gini: equality → 0, near-total concentration, hand value, negatives rejected") {
    val equal = Seq(5.0, 5.0, 5.0, 5.0).toDF("v")
    assert(Metrics.gini(equal, "v").head().getDouble(0) === 0.0)
    // one holder of everything among n=4: G = (n-1)/n = 0.75
    val conc = Seq(0.0, 0.0, 0.0, 100.0).toDF("v")
    assert(Metrics.gini(conc, "v").head().getDouble(0) === 0.75)
    // hand: values 1,2,3,4 → G = 2·(1·1+2·2+3·3+4·4)/(4·10) − 5/4
    //     = 2·30/40 − 1.25 = 0.25
    val hand = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    assert(Metrics.gini(hand, "v").head().getDouble(0) === 0.25)
    val neg = Seq(-1.0, 2.0).toDF("v")
    intercept[Exception] { Metrics.gini(neg, "v").collect() }
  }

  test("gini: a value overflowing DECIMAL(18,6) fails loudly, like the oracle engine") {
    val big = Seq(1.0, 2.0, 1.0e13).toDF("v")
    val e = intercept[Exception] { Metrics.gini(big, "v").collect() }
    assert(e.getMessage.contains("overflows DECIMAL(18,6)"), e.getMessage)
    val eg = intercept[Exception] {
      Metrics.giniByGroup(Seq(("a", 1.0), ("a", 1.0e13)).toDF("g", "v"),
        "g", "v").collect()
    }
    assert(eg.getMessage.contains("overflows DECIMAL(18,6)"), eg.getMessage)
  }

  test("giniByGroup matches the global gini computed per slice") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0))
      .toDF("k", "v")
    val grouped = Metrics.giniByGroup(df, "k", "v")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    for (k <- Seq("a", "b")) {
      val solo = Metrics.gini(df.filter(col("k") === k), "v").head()
      assert(grouped(k) === ((solo.getDouble(0), solo.getLong(1))), s"group $k")
    }
    assert(grouped("a") === ((0.25, 4L)) && grouped("b") === ((0.0, 3L)))
  }

  test("regressionReport: hand-checked values; perfect fit; constant target") {
    // y = (2,4,6), pred = (1,4,8): res = (1,0,-2) → mse = 5/3, mae = 1
    // ȳ = 4, sstot = 8 → r2 = 1 − 5/8 = 0.375
    val df = Seq((2.0, 1.0), (4.0, 4.0), (6.0, 8.0)).toDF("y", "pred")
    val r = Metrics.regressionReport(df, "y", "pred").head()
    assert(r.getLong(0) === 3L)
    assert(math.abs(r.getDouble(1) - 5.0 / 3) < 1e-6)      // mse
    assert(math.abs(r.getDouble(2) - math.sqrt(5.0 / 3)) < 1e-6) // rmse
    assert(r.getDouble(3) === 1.0)                          // mae
    assert(math.abs(r.getDouble(4) - 0.375) < 1e-6) // r2
    // perfect predictions: zero error, r2 = 1
    val perfect = Seq((2.0, 2.0), (4.0, 4.0), (6.0, 6.0)).toDF("y", "pred")
    val pr = Metrics.regressionReport(perfect, "y", "pred").head()
    assert(pr.getDouble(1) === 0.0 && pr.getDouble(4) === 1.0)
    // constant target: sstot = 0 → null r2, mse still defined
    val const = Seq((5.0, 4.0), (5.0, 6.0)).toDF("y", "pred")
    val cr = Metrics.regressionReport(const, "y", "pred").head()
    assert(cr.getDouble(1) === 1.0 && cr.isNullAt(4))
  }

  test("aucBinary: separable = 1.0, random-ish fixture matches hand AUC, ties averaged") {
    val sep = Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)).toDF("label", "score")
    assert(Metrics.aucBinary(sep, "label", "score").head().getDouble(0) === 1.0)
    // one inversion among 2x2 pairs: AUC = 3/4
    val inv = Seq((1, 0.9), (1, 0.3), (0, 0.5), (0, 0.1)).toDF("label", "score")
    assert(Metrics.aucBinary(inv, "label", "score").head().getDouble(0) === 0.75)
    // tie between a positive and a negative counts half:
    // pairs = win, win, tie(0.5), win → AUC = 3.5/4 = 0.875
    val tie = Seq((1, 0.9), (1, 0.5), (0, 0.5), (0, 0.1)).toDF("label", "score")
    val r = Metrics.aucBinary(tie, "label", "score").head()
    assert(r.getDouble(0) === 0.875 && r.getLong(1) === 2L && r.getLong(2) === 2L)
  }

  test("recallAtK: overlap ratio, duplicate-insensitive, empty-truth NULL") {
    def ids(xs: Long*) = xs.toDF("vec_id")
    val r = Metrics.recallAtK(ids(1, 2, 3, 7, 8), ids(1, 2, 3, 4, 5),
      "vec_id").head()
    assert(r.getLong(0) === 5L && r.getLong(1) === 3L
      && r.getDouble(2) === 0.6)
    // duplicates in either side don't inflate
    val d = Metrics.recallAtK(ids(1, 1, 2), ids(1, 2, 2), "vec_id").head()
    assert(d.getLong(0) === 2L && d.getLong(1) === 2L && d.getDouble(2) === 1.0)
    // empty truth -> recall NULL, not a crash
    val e = Metrics.recallAtK(ids(1), ids().filter($"vec_id" < 0), "vec_id")
      .head()
    assert(e.getLong(0) === 0L && e.isNullAt(2))
  }
}
