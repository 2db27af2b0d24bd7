package graft.ml

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DriversSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cluster: k cells, all rows assigned, silhouette in range, seeded-stable") {
    val customer = TestSpark.table("customer")
    val r = Drivers.cluster(customer, Seq("c_acctbal", "c_nationkey"), k = 3)
    assert(r.sizes.keySet.subsetOf(Set(0, 1, 2)) && r.sizes.nonEmpty)
    assert(r.sizes.values.sum === customer.count())
    assert(r.silhouette >= -1.0 && r.silhouette <= 1.0)
    val again = Drivers.cluster(customer, Seq("c_acctbal", "c_nationkey"), k = 3)
    assert(again.sizes === r.sizes) // seed 42 ⇒ reproducible
  }

  test("classify: held-out accuracy is a sane probability, predictions typed") {
    val li = TestSpark.table("lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_discount"), col("l_shipdate"))
      .withColumn("ship_year", year(col("l_shipdate")).cast("double"))
    // l_returnflag is decidable from shipdate year in TPC-H-ish data:
    // a genuinely learnable target, so accuracy must beat the prior
    val r = Drivers.classify(li, "l_returnflag",
      categoricalCols = Seq("l_linestatus"),
      numericCols = Seq("l_quantity", "l_discount", "ship_year"))
    assert(r.accuracy >= 0.0 && r.accuracy <= 1.0)
    assert(r.predictions.count() > 0)
    val majority = li.groupBy("l_returnflag").count()
      .agg(max("count")).head.getLong(0).toDouble / li.count()
    assert(r.accuracy >= majority * 0.9,
      s"accuracy ${r.accuracy} should approach the majority prior $majority")
  }

  test("binaryAuc on a real fitted model beats chance on a learnable target") {
    // binary target derived from shipdate year (learnable); classify
    // fits a weighted LogisticRegression whose probability vector
    // feeds the exact rank-statistic AUC through the quantized bridge
    val li = TestSpark.table("lineitem")
      .select(col("l_quantity"), col("l_discount"), col("l_shipdate"))
      .withColumn("ship_year", year(col("l_shipdate")).cast("double"))
      .withColumn("is_late", (col("ship_year") >= 1996).cast("string"))
    val r = Drivers.classify(li, "is_late",
      categoricalCols = Nil,
      numericCols = Seq("l_quantity", "l_discount", "ship_year"))
    val auc = Drivers.binaryAuc(r.predictions, "__label")
    assert(auc > 0.9, s"AUC $auc should be near-perfect on a separable target")
    assert(auc <= 1.0)
  }

  test("binaryAuc on a single-class label fails with a clear message, not an opaque error") {
    val oneClass = spark.range(10).select(
      lit(1).as("y"),
      org.apache.spark.ml.functions.array_to_vector(
        array((col("id") / 10.0).cast("double"),
          lit(1.0) - col("id") / 10.0)).as("probability"))
    val e = intercept[IllegalArgumentException] {
      Drivers.binaryAuc(oneClass, "y")
    }
    assert(e.getMessage.contains("both classes"), e.getMessage)
  }

  test("classify: stratified split preserves per-class proportions in train and test") {
    val li = TestSpark.table("lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"))
    val data = li.withColumn("weight", lit(1.0))
    val (train, test) = graft.features.Features
      .stratifiedSplit(data, "l_returnflag", 0.2, seed = 42L)
    val total = data.count().toDouble
    val classFrac = data.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / total).toMap
    val trainTotal = train.count().toDouble
    train.groupBy("l_returnflag").count().collect().foreach { r =>
      val frac = r.getLong(1) / trainTotal
      assert(math.abs(frac - classFrac(r.getString(0))) < 0.05,
        s"train class ${r.getString(0)} fraction $frac vs ${classFrac(r.getString(0))}")
    }
    assert(math.abs(train.count() / total - 0.8) < 0.05)
    assert(train.count() + test.count() === total.toLong) // partition, no loss
  }

  // a genuinely separable 3-class dataset (the synthetic lineitem has
  // no returnflag signal): class determines both the numeric blob and
  // the categorical, so every competent model lands near accuracy 1
  private def separable3 = (0 until 900).map { i =>
    val cls = i % 3
    val x = cls * 10.0 + (i % 7) * 0.5
    val y = cls * -8.0 + (i % 11) * 0.3
    val cat = Seq("u", "v", "w")(cls)
    (s"c$cls", cat, x, y)
  }.toDF("label", "cat", "x", "y")

  test("compareModels: four model families scored, metrics in range, best is argmax") {
    val r = Drivers.compareModels(separable3, "label",
      categoricalCols = Seq("cat"), numericCols = Seq("x", "y"))
    assert(r.scores.map(_.model) === Seq("rf", "logreg", "svm", "mlp"))
    assert(r.scores.forall(s => s.accuracy >= 0.0 && s.accuracy <= 1.0))
    assert(r.scores.forall(s => s.f1 >= 0.0 && s.f1 <= 1.0))
    val bestAcc = r.scores.map(_.accuracy).max
    assert(r.scores.find(_.model == r.best).get.accuracy === bestAcc)
    assert(bestAcc >= 0.9, s"separable data must be learnable: ${r.scores}")
  }

  test("gridSearchClassify: CV picks a config per model, best generalizes") {
    val r = Drivers.gridSearchClassify(separable3, "label",
      categoricalCols = Seq("cat"), numericCols = Seq("x", "y"))
    assert(r.perModel.map(_._1) === Seq("logreg", "rf"))
    assert(r.perModel.forall(m => m._2 >= 0.0 && m._2 <= 1.0))
    assert(r.cvAccuracy === r.perModel.map(_._2).max)
    assert(r.heldOutAccuracy >= 0.9, s"held-out ${r.heldOutAccuracy}")
  }

  test("perClassReport matches a hand-computed confusion matrix, zero_division=0") {
    // truth:  a a a b b c ; pred: a b a b a c → plus a never-true pred 'd'
    val pred = Seq(("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"),
      ("b", "a"), ("c", "c"), ("c", "d")).toDF("y", "yhat")
    val rep = Drivers.perClassReport(pred, "y", "yhat").collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    // a: tp=2, predicted=3, support=3 → p=2/3, r=2/3
    assert(rep("a") === ((0.666667, 0.666667, 0.666667, 3L)))
    // b: tp=1, predicted=2, support=2 → p=0.5, r=0.5
    assert(rep("b") === ((0.5, 0.5, 0.5, 2L)))
    // c: tp=1, predicted=1, support=2 → p=1, r=0.5, f1=2/3
    assert(rep("c") === ((1.0, 0.5, 0.666667, 2L)))
    // d: predicted only — support 0, all metrics zero_division=0
    assert(rep("d") === ((0.0, 0.0, 0.0, 0L)))
  }

  test("bestK: silhouette argmax recovers the planted cluster count") {
    // three tight, well-separated 2-D blobs → silhouette peaks at k=3
    val pts = Seq((0.0, 0.0), (100.0, 0.0), (0.0, 100.0)).flatMap { case (cx, cy) =>
      (1 to 30).map(i => (cx + (i % 5) * 0.1, cy + (i % 7) * 0.1))
    }
    val df = pts.toDF("x", "y")
    val r = Drivers.bestK(df, Seq("x", "y"), kRange = 2 to 6)
    assert(r.bestK === 3, s"scores: ${r.scores}")
    assert(r.scores.map(_._1) === (2 to 6))
    // inertia (within-cluster SSE, the elbow-curve input) is reported
    // per k and must not increase as k grows on the planted fixture
    assert(r.inertias.map(_._1) === (2 to 6))
    r.inertias.map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-6, s"inertias: ${r.inertias}")
      case _ =>
    }
    assert(r.inertias.forall(_._2 >= 0.0))
  }

  test("pca2: two components, nonincreasing explained variance, rows preserved") {
    val customer = TestSpark.table("customer")
    val r = Drivers.pca2(customer, Seq("c_acctbal", "c_nationkey", "c_custkey"))
    assert(r.projected.columns.contains("pc1") && r.projected.columns.contains("pc2"))
    assert(r.projected.count() === customer.count())
    assert(r.explainedVariance.length === 2)
    assert(r.explainedVariance(0) >= r.explainedVariance(1),
      s"variance order ${r.explainedVariance.toSeq}")
    assert(r.explainedVariance.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("H7: fitted classification pipeline survives a save/load round-trip") {
    val li = TestSpark.table("lineitem")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      .limit(1000)
    val r = Drivers.classify(li, "l_returnflag",
      categoricalCols = Seq("l_linestatus"), numericCols = Seq("l_quantity"))
    val path = java.nio.file.Files.createTempDirectory("plm").toString + "/model"
    r.model.write.overwrite().save(path)
    val loaded = org.apache.spark.ml.PipelineModel.load(path)
    val orig = r.model.transform(li).select("l_returnflag", "__pred")
      .collect().map(x => (x.getString(0), x.getDouble(1))).toSeq
    val fromDisk = loaded.transform(li).select("l_returnflag", "__pred")
      .collect().map(x => (x.getString(0), x.getDouble(1))).toSeq
    assert(fromDisk === orig, "loaded pipeline must predict identically")
  }

  test("H7: label-encoding mapping table survives a parquet round-trip") {
    val c = TestSpark.table("customer")
    val mapping = graft.features.Features.labelEncoding(c, "c_mktsegment")
    val path = java.nio.file.Files.createTempDirectory("enc").toString + "/map"
    mapping.write.parquet(path)
    val loaded = spark.read.parquet(path)
    val a = mapping.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = loaded.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a === b && a.nonEmpty)
  }

  test("olsFit recovers a known linear relationship exactly") {
    val df = (1 to 50).map(i => (i.toDouble, 3.5 * i + 7.0)).toDF("x", "y")
    val row = Drivers.olsFit(df, col("x"), col("y")).head
    assert(math.abs(row.getDouble(0) - 3.5) < 1e-9)
    assert(math.abs(row.getDouble(1) - 7.0) < 1e-9)
  }

  test("forecastDaily emits horizon rows continuing the trend") {
    val daily = (1 to 20)
      .map(i => (java.sql.Date.valueOf(f"2024-01-$i%02d"), i.toLong * 2))
      .toDF("d", "c")
    val out = Drivers.forecastDaily(daily, "d", "c", horizon = 5)
      .orderBy("d").collect()
    assert(out.length === 5)
    assert(out.head.getDate(0).toString === "2024-01-21")
    // exact line c = 2·day-index ⇒ prediction for day 21 is 42
    assert(math.abs(out.head.getDouble(1) - 42.0) < 1e-6)
  }
}
