package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.{ClusteringEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.feature.{OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler}
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

  final case class ClassifyResult(predictions: DataFrame, accuracy: Double)

  /** Multiclass classification: index label, one-hot categorical
    * features, assemble, seeded split, weighted logistic regression
    * (class weights per `machineLearning.py:80-98`), accuracy on the
    * held-out set (`:449-573`). */
  def classify(df: DataFrame, labelCol: String, categoricalCols: Seq[String],
      numericCols: Seq[String], seed: Long = 42L,
      testFraction: Double = 0.2): ClassifyResult = {
    val data = graft.features.Features
      .classWeights(df, labelCol).select(col(labelCol), col("weight"))
      .join(df, labelCol)
    val stages =
      Seq(new StringIndexer().setInputCol(labelCol).setOutputCol("__label")
        .setHandleInvalid("keep")) ++
      categoricalCols.map(c => new StringIndexer().setInputCol(c)
        .setOutputCol(s"__i_$c").setHandleInvalid("keep")) ++
      Seq(new OneHotEncoder()
        .setInputCols(categoricalCols.map(c => s"__i_$c").toArray)
        .setOutputCols(categoricalCols.map(c => s"__o_$c").toArray),
        new VectorAssembler()
          .setInputCols((categoricalCols.map(c => s"__o_$c") ++ numericCols).toArray)
          .setOutputCol("__features").setHandleInvalid("skip"),
        new LogisticRegression().setLabelCol("__label")
          .setFeaturesCol("__features").setWeightCol("weight")
          .setPredictionCol("__pred").setMaxIter(50))
    val Array(train, test) = data.randomSplit(Array(1 - testFraction, testFraction), seed)
    val model = new Pipeline().setStages(stages.toArray).fit(train)
    val predictions = model.transform(test)
    val accuracy = new MulticlassClassificationEvaluator()
      .setLabelCol("__label").setPredictionCol("__pred")
      .setMetricName("accuracy").evaluate(predictions)
    ClassifyResult(predictions, accuracy)
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
