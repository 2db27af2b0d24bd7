package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification.{LinearSVC, LogisticRegression,
  MultilayerPerceptronClassifier, OneVsRest, RandomForestClassifier}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.{ClusteringEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.{OneHotEncoder, PCA, PCAModel, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Thin spark.ml drivers reproducing the reference's three analytics
  * consumers (`machineLearning.py` TASK modes: clustering `:307-412`,
  * classification `:449-573`, regression `:575-653`). The engine
  * deliverable is the feature pipeline; these drivers show the same
  * end-to-end workloads running on it — distributed, seeded, with the
  * reference's evaluation metrics (silhouette, accuracy).
  */
object Drivers {

  final case class ClusterResult(assigned: DataFrame, silhouette: Double,
      sizes: Map[Int, Long])

  /** KMeans clustering over numeric feature columns, standardized —
    * the reference's cluster task (seed 42, silhouette evaluation,
    * per-cluster sizes; `machineLearning.py:307-412`). */
  def cluster(df: DataFrame, featureCols: Seq[String], k: Int,
      seed: Long = 42L): ClusterResult = {
    val pipeline = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(featureCols.toArray)
        .setOutputCol("__raw").setHandleInvalid("skip"),
      new StandardScaler().setInputCol("__raw").setOutputCol("__features")
        .setWithMean(true).setWithStd(true),
      new KMeans().setK(k).setSeed(seed)
        .setFeaturesCol("__features").setPredictionCol("cluster")))
    val assigned = pipeline.fit(df).transform(df)
    val silhouette = new ClusteringEvaluator()
      .setFeaturesCol("__features").setPredictionCol("cluster")
      .evaluate(assigned)
    val sizes = assigned.groupBy("cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    ClusterResult(assigned.drop("__raw", "__features"), silhouette, sizes)
  }

  /** [[cluster]] scored against ground-truth labels with the Adjusted
    * Rand Index ([[Metrics.adjustedRandIndex]]) — the reference's
    * `adjusted_rand_score(labels, clusters)` (`machineLearning.py:367`).
    * The contingency reduction is one tiny aggregate over the assigned
    * frame; no predictions ever leave the cluster. */
  def clusterWithAri(df: DataFrame, featureCols: Seq[String], k: Int,
      labelCol: String, seed: Long = 42L): (ClusterResult, Double) = {
    val res = cluster(df, featureCols, k, seed)
    val ari = Metrics.adjustedRandIndex(res.assigned, "cluster", labelCol)
      .head().getDouble(0)
    (res, ari)
  }

  final case class ClassifyResult(predictions: DataFrame, accuracy: Double,
      model: PipelineModel)

  /** Shared preprocessing: index label → index + one-hot categoricals →
    * assemble with numerics into `__features` (the reference's
    * ColumnTransformer, `machineLearning.py:441-447`). */
  private def preprocessStages(labelCol: String, categoricalCols: Seq[String],
      numericCols: Seq[String]): Seq[PipelineStage] =
    Seq(new StringIndexer().setInputCol(labelCol).setOutputCol("__label")
      .setHandleInvalid("keep")) ++
    categoricalCols.map(c => new StringIndexer().setInputCol(c)
      .setOutputCol(s"__i_$c").setHandleInvalid("keep")) ++
    Seq(new OneHotEncoder()
      .setInputCols(categoricalCols.map(c => s"__i_$c").toArray)
      .setOutputCols(categoricalCols.map(c => s"__o_$c").toArray),
      new VectorAssembler()
        .setInputCols((categoricalCols.map(c => s"__o_$c") ++ numericCols).toArray)
        .setOutputCol("__features").setHandleInvalid("skip"))

  private def withWeights(df: DataFrame, labelCol: String): DataFrame =
    graft.features.Features
      .classWeights(df, labelCol).select(col(labelCol), col("weight"))
      .join(df, labelCol)

  /** Multiclass classification: index label, one-hot categorical
    * features, assemble, seeded STRATIFIED split (the reference splits
    * with `stratify=y`, `machineLearning.py:433`), weighted logistic
    * regression (class weights per `machineLearning.py:80-98`),
    * accuracy on the held-out set (`:449-573`). The fitted
    * PipelineModel is returned for persistence round-trips (H7). */
  def classify(df: DataFrame, labelCol: String, categoricalCols: Seq[String],
      numericCols: Seq[String], seed: Long = 42L,
      testFraction: Double = 0.2): ClassifyResult = {
    val data = withWeights(df, labelCol)
    val stages = preprocessStages(labelCol, categoricalCols, numericCols) :+
      new LogisticRegression().setLabelCol("__label")
        .setFeaturesCol("__features").setWeightCol("weight")
        .setPredictionCol("__pred").setMaxIter(50)
    val (train, test) = graft.features.Features
      .stratifiedSplit(data, labelCol, testFraction, seed)
    val model = new Pipeline().setStages(stages.toArray).fit(train)
    val predictions = model.transform(test)
    val accuracy = new MulticlassClassificationEvaluator()
      .setLabelCol("__label").setPredictionCol("__pred")
      .setMetricName("accuracy").evaluate(predictions)
    ClassifyResult(predictions, accuracy, model)
  }

  final case class ModelScore(model: String, accuracy: Double, f1: Double)
  final case class CompareResult(scores: Seq[ModelScore], best: String)

  /** Multi-model comparison — the reference's model dict and evaluation
    * loop (`machineLearning.py:449-553`: RandomForest, LogisticRegression,
    * SVM, MLP). Preprocessing is fitted ONCE on the train split and each
    * classifier trains on the transformed features (the reference's
    * "transform data once" pattern, `:318-320`); every model is scored
    * on the same held-out set with accuracy and weighted F1. Ties pick
    * the first model in input order (np.argmax semantics). */
  def compareModels(df: DataFrame, labelCol: String,
      categoricalCols: Seq[String], numericCols: Seq[String],
      models: Seq[String] = Seq("rf", "logreg", "svm", "mlp"),
      seed: Long = 42L, testFraction: Double = 0.2): CompareResult = {
    val data = withWeights(df, labelCol)
    val (train, test) = graft.features.Features
      .stratifiedSplit(data, labelCol, testFraction, seed)
    val prep = new Pipeline()
      .setStages(preprocessStages(labelCol, categoricalCols, numericCols).toArray)
      .fit(train)
    val trainF = prep.transform(train)
      .select(col("__label"), col("__features"), col("weight")).cache()
    val testF = prep.transform(test)
      .select(col("__label"), col("__features"), col("weight"))
    val featSize = trainF.head.getAs[Vector](1).size
    val numClasses = trainF.agg(max("__label")).head.getDouble(0).toInt + 1

    def classifier(name: String) = name match {
      case "logreg" => new LogisticRegression().setLabelCol("__label")
        .setFeaturesCol("__features").setWeightCol("weight")
        .setPredictionCol("__pred").setMaxIter(50)
      case "rf" => new RandomForestClassifier().setLabelCol("__label")
        .setFeaturesCol("__features").setWeightCol("weight")
        .setPredictionCol("__pred").setSeed(seed).setNumTrees(50)
      case "svm" => new OneVsRest().setLabelCol("__label")
        .setFeaturesCol("__features").setWeightCol("weight")
        .setPredictionCol("__pred")
        .setClassifier(new LinearSVC().setMaxIter(30))
      case "mlp" => new MultilayerPerceptronClassifier()
        .setLabelCol("__label").setFeaturesCol("__features")
        .setPredictionCol("__pred").setSeed(seed).setMaxIter(60)
        // input layer = assembled width, output = train class count
        .setLayers(Array(featSize, 16, numClasses))
      case other => throw new IllegalArgumentException(s"unknown model $other")
    }
    def eval(metric: String, pred: DataFrame): Double =
      new MulticlassClassificationEvaluator()
        .setLabelCol("__label").setPredictionCol("__pred")
        .setMetricName(metric).evaluate(pred)
    val scores = models.map { name =>
      // cache the scored frame: both evaluator actions would otherwise
      // re-run the test read + preprocessing + model transform
      val pred = classifier(name).fit(trainF).transform(testF).cache()
      try ModelScore(name, eval("accuracy", pred), eval("f1", pred))
      finally pred.unpersist()
    }
    trainF.unpersist()
    CompareResult(scores, scores.maxBy(_.accuracy).model)
  }

  final case class GridResult(best: String, cvAccuracy: Double,
      heldOutAccuracy: Double, perModel: Seq[(String, Double)])

  /** Grid-search cross-validation across models — mirrors
    * `GridSearchCV(pipeline, params, cv=3, scoring='accuracy')` and the
    * best-global-model loop (`machineLearning.py:489-545`): each model
    * gets its own hyperparameter grid, 3-fold seeded CV picks its best
    * configuration, and the globally best CV score wins; final
    * evaluation on the untouched held-out split. */
  def gridSearchClassify(df: DataFrame, labelCol: String,
      categoricalCols: Seq[String], numericCols: Seq[String],
      seed: Long = 42L, testFraction: Double = 0.2,
      numFolds: Int = 3): GridResult = {
    val data = withWeights(df, labelCol)
    val (train, test) = graft.features.Features
      .stratifiedSplit(data, labelCol, testFraction, seed)
    val prep = new Pipeline()
      .setStages(preprocessStages(labelCol, categoricalCols, numericCols).toArray)
      .fit(train)
    val trainF = prep.transform(train)
      .select(col("__label"), col("__features"), col("weight")).cache()
    val testF = prep.transform(test)
      .select(col("__label"), col("__features"), col("weight"))
    val evaluator = new MulticlassClassificationEvaluator()
      .setLabelCol("__label").setPredictionCol("__pred")
      .setMetricName("accuracy")

    val lr = new LogisticRegression().setLabelCol("__label")
      .setFeaturesCol("__features").setWeightCol("weight")
      .setPredictionCol("__pred").setMaxIter(50)
    val rf = new RandomForestClassifier().setLabelCol("__label")
      .setFeaturesCol("__features").setWeightCol("weight")
      .setPredictionCol("__pred").setSeed(seed)
    val configs: Seq[(String, CrossValidator)] = Seq(
      "logreg" -> new CrossValidator().setEstimator(lr)
        .setEstimatorParamMaps(new ParamGridBuilder()
          .addGrid(lr.regParam, Array(0.0, 0.1, 1.0)).build())
        .setEvaluator(evaluator).setNumFolds(numFolds).setSeed(seed),
      "rf" -> new CrossValidator().setEstimator(rf)
        .setEstimatorParamMaps(new ParamGridBuilder()
          .addGrid(rf.numTrees, Array(10, 30))
          .addGrid(rf.maxDepth, Array(3, 6)).build())
        .setEvaluator(evaluator).setNumFolds(numFolds).setSeed(seed))

    val fitted = configs.map { case (name, cv) =>
      val m = cv.fit(trainF)
      (name, m, m.avgMetrics.max)
    }
    trainF.unpersist()
    val (bestName, bestModel, bestCv) = fitted.maxBy(_._3)
    val heldOut = evaluator.evaluate(bestModel.transform(testF))
    GridResult(bestName, bestCv, heldOut, fitted.map(f => (f._1, f._3)))
  }

  /** Per-class precision/recall/F1/support — `classification_report`
    * (`machineLearning.py:481,552`, zero_division=0), computed
    * RELATIONALLY from the confusion counts: two groupBys over the
    * prediction frame (by true label, by predicted label) joined on the
    * class. No collect — the report is a k-row DataFrame, and the whole
    * computation is SQL-expressible (q54 oracle-checks it against
    * DuckDB with a deterministic predictor). */
  def perClassReport(pred: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val byLabel = pred.groupBy(col(labelCol).as("label")).agg(
      count(lit(1)).as("support"),
      sum(when(col(labelCol) === col(predCol), 1L).otherwise(0L)).as("tp"))
    val byPred = pred.groupBy(col(predCol).as("label"))
      .agg(count(lit(1)).as("predicted"))
    val p = try_divide(col("tp").cast("double"), col("predicted"))
    val r = try_divide(col("tp").cast("double"), col("support"))
    byLabel.join(byPred, Seq("label"), "full")
      .na.fill(0L, Seq("support", "tp", "predicted"))
      .select(col("label"),
        round(coalesce(p, lit(0.0)), 6).as("precision"),
        round(coalesce(r, lit(0.0)), 6).as("recall"),
        round(coalesce(try_divide(lit(2.0) * p * r, p + r), lit(0.0)), 6).as("f1"),
        col("support"))
  }

  /** Exact AUC over a fitted classifier's probability output — the
    * bridge from spark.ml vectors to [[Metrics.aucBinary]]: extracts
    * P(class = positiveIndex) from the `probability` vector column and
    * GRID-QUANTIZES it to 6 decimals first, so the distinct-score
    * relation the rank statistic runs over stays bounded no matter how
    * many raw float probabilities the model emits (the documented
    * contract of the AUC's global window). `labelCol` is the indexed
    * 0/1 label. */
  def binaryAuc(predictions: DataFrame, labelCol: String,
      positiveIndex: Int = 1,
      probabilityCol: String = "probability"): Double = {
    val row = Metrics.aucBinary(
      predictions.select(col(labelCol).cast("int").as("label"),
        round(vector_to_array(col(probabilityCol))
          .getItem(positiveIndex), 6).as("score")),
      "label", "score")
      .head()
    // AUC is undefined with only one class present (P or N = 0 makes
    // the rank statistic NULL) — say so instead of an opaque NPE
    if (row.isNullAt(0))
      throw new IllegalArgumentException(
        s"binaryAuc: AUC is undefined — '$labelCol' must contain both " +
          s"classes (positives=${row.getLong(1)}, negatives=${row.getLong(2)})")
    row.getDouble(0)
  }

  final case class BestKResult(bestK: Int, scores: Seq[(Int, Double)],
      inertias: Seq[(Int, Double)])

  /** Silhouette + inertia K-scan — the reference's elbow/silhouette
    * analysis (`machineLearning.py:322-359`): preprocess once, fit
    * seeded KMeans per k in `kRange`, silhouette each, argmax wins
    * (first max on ties, np.argmax semantics). Each fit also records
    * the model's inertia (`kmeans.inertia_`, `machineLearning.py:325-344`
    * — Spark's `summary.trainingCost` is the same within-cluster
    * sum-of-squares statistic), the elbow-curve input the reference
    * plots alongside the silhouette. The standardized feature frame is
    * cached across the scan — one preprocessing pass, |kRange| fits. */
  def bestK(df: DataFrame, featureCols: Seq[String], kRange: Seq[Int],
      seed: Long = 42L): BestKResult = {
    require(kRange.nonEmpty && kRange.forall(_ >= 2), "need k >= 2")
    val prep = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(featureCols.toArray)
        .setOutputCol("__raw").setHandleInvalid("skip"),
      new StandardScaler().setInputCol("__raw").setOutputCol("__features")
        .setWithMean(true).setWithStd(true))).fit(df)
    val feats = prep.transform(df).select("__features").cache()
    val scored = kRange.map { k =>
      val model = new KMeans().setK(k).setSeed(seed)
        .setFeaturesCol("__features").setPredictionCol("cluster")
        .fit(feats)
      val silhouette = new ClusteringEvaluator()
        .setFeaturesCol("__features").setPredictionCol("cluster")
        .evaluate(model.transform(feats))
      (k, silhouette, model.summary.trainingCost)
    }
    feats.unpersist()
    val scores = scored.map { case (k, s, _) => (k, s) }
    BestKResult(scores.maxBy(_._2)._1, scores,
      scored.map { case (k, _, i) => (k, i) })
  }

  final case class PcaResult(projected: DataFrame, explainedVariance: Array[Double])

  /** PCA 2-component projection of standardized features — the cluster
    * visualization input (`machineLearning.py:388-403`). Returns the
    * input frame with `pc1`/`pc2` columns plus the explained-variance
    * ratios (spec asserts the nonincreasing order PCA guarantees). */
  def pca2(df: DataFrame, featureCols: Seq[String]): PcaResult = {
    val model = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(featureCols.toArray)
        .setOutputCol("__raw").setHandleInvalid("skip"),
      new StandardScaler().setInputCol("__raw").setOutputCol("__features")
        .setWithMean(true).setWithStd(true),
      new PCA().setK(2).setInputCol("__features").setOutputCol("__pc")))
      .fit(df)
    val projected = model.transform(df)
      .withColumn("pc1", vector_to_array(col("__pc")).getItem(0))
      .withColumn("pc2", vector_to_array(col("__pc")).getItem(1))
      .drop("__raw", "__features", "__pc")
    val variance = model.stages.last.asInstanceOf[PCAModel]
      .explainedVariance.toArray
    PcaResult(projected, variance)
  }

  /** Closed-form simple OLS over (x, y) columns: slope = cov/var,
    * intercept = ȳ − slope·x̄ — the distributed two-pass formulation of
    * the reference's regression forecast fit (`machineLearning.py:
    * 575-653`), exactly reproducible in any SQL engine (regr_slope /
    * regr_intercept), unlike an iterative solver. Returns (slope,
    * intercept) as a 1-row frame so it stays in the plan (no driver
    * round-trip) for [[forecast]]. */
  def olsFit(df: DataFrame, x: Column, y: Column): DataFrame = {
    // try_divide: var_pop(x)=0 (constant or single-point x) yields null
    // slope/intercept — both the ANSI-safe behavior (plain `/` throws
    // DIVIDE_BY_ZERO under Spark 4 defaults) and DuckDB's regr_slope
    // semantics, keeping the oracle parity on degenerate inputs
    val slope = try_divide(covar_pop(x, y), var_pop(x))
    df.agg(slope.as("slope"),
      (avg(y) - slope * avg(x)).as("intercept"))
  }

  /** Linear forecast of a daily-count series `horizon` days past its
    * last date: fit OLS on (proleptic ordinal day, count), emit one
    * predicted row per future day (C7 ordinal features + C8 future
    * frame + E1 series in one plan). */
  def forecastDaily(daily: DataFrame, dateCol: String, countCol: String,
      horizon: Int): DataFrame = {
    // sequence(start, stop) steps BACKWARDS when start > stop: a
    // non-positive horizon would emit past-dated "forecast" rows
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    // proleptic ordinal: days since 0001-01-01 + 1 (pandas toordinal)
    val ord = datediff(col(dateCol), to_date(lit("0001-01-01"))) + 1
    val fit = olsFit(daily.withColumn("__x", ord.cast("double")),
      col("__x"), col(countCol).cast("double"))
    val lastDay = daily.agg(max(col(dateCol)).as("d0"))
    lastDay.crossJoin(fit)
      .select(explode(sequence(date_add(col("d0"), 1), date_add(col("d0"), horizon)))
        .as("d"), col("slope"), col("intercept"))
      .select(col("d"),
        (col("intercept") + col("slope") *
          (datediff(col("d"), to_date(lit("0001-01-01"))) + 1).cast("double"))
          .as("predicted"))
  }
}
