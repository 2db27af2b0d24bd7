package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational model-evaluation metrics — the scoring surface the
  * reference computes driver-side with sklearn
  * (`machineLearning.py:367` adjusted_rand_score,
  * `deeplearning/evaluate.py:49-79` per-class ROC), re-expressed as
  * pure aggregation plans: no collect of predictions, every statistic
  * assembled from exact integer counts with the float division at the
  * very edge — which is also what makes each one oracle-checkable
  * bit-for-bit in an external SQL engine.
  */
object Metrics {

  /** Decimal-grid cast for the Gini family with a loud overflow
    * contract: a value whose integral part exceeds DECIMAL(18,6)'s 12
    * digits would either throw an opaque cast error (ANSI mode) or
    * cast to NULL (non-ANSI — silently forming a null __v group that
    * skews n while dropping from Σv) where DuckDB errors. try_cast
    * nulls the overflow in BOTH modes, so the guard fires one clear,
    * mode-independent error — the oracle engine's behavior. */
  private def giniValue(valueCol: String,
      d6: org.apache.spark.sql.types.DecimalType): Column = {
    val in = col(valueCol)
    val tc = expr(s"try_cast(`$valueCol` AS DECIMAL(18,6))")
    when(in.isNotNull && tc.isNull,
      raise_error(lit(
        "gini: value overflows DECIMAL(18,6) (>= 1e12) — rescale the measure"))
        .cast(d6))
      .otherwise(tc)
  }

  /** Adjusted Rand Index between a clustering and ground-truth labels
    * — `sklearn.adjusted_rand_score` (`machineLearning.py:367`):
    *
    *   ARI = (Σᵢⱼ C(nᵢⱼ,2) − E) / (½(Σᵢ C(aᵢ,2) + Σⱼ C(bⱼ,2)) − E),
    *   E = Σᵢ C(aᵢ,2)·Σⱼ C(bⱼ,2) / C(n,2)
    *
    * Scale shape: ONE shuffle builds the (clusters × labels)
    * contingency table — small by definition — and the three marginal
    * reductions run over that tiny relation. All pair counts are exact
    * BIGINTs; the only floating-point ops are the final three (the
    * products are cast to double first — at 10⁹ rows the C(n,2)
    * products overflow even Long), written as the identical IEEE
    * sequence in the SQL oracle. Denominator zero (both partitions
    * trivial) returns 1.0, sklearn's convention. Null cluster/label
    * rows are excluded (sklearn has no null class).
    *
    * Returns one row: (ari, n_obs). */
  def adjustedRandIndex(df: DataFrame, clusterCol: String,
      labelCol: String): DataFrame = {
    val cells = df
      .filter(col(clusterCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(clusterCol).as("__c"), col(labelCol).as("__l"))
      .agg(count(lit(1)).as("n"))
    def c2(c: String): Column = expr(s"$c * ($c - 1) DIV 2")
    val idx = cells.agg(sum(c2("n")).as("sij"), sum(col("n")).as("nn"))
    val sa = cells.groupBy(col("__c")).agg(sum(col("n")).as("t"))
      .agg(sum(c2("t")).as("sa"))
    val sb = cells.groupBy(col("__l")).agg(sum(col("n")).as("t"))
      .agg(sum(c2("t")).as("sb"))
    val expected = col("sa").cast("double") * col("sb").cast("double") /
      c2("nn").cast("double")
    val maxIdx = (col("sa") + col("sb")).cast("double") / lit(2.0)
    val denom = maxIdx - expected
    idx.crossJoin(sa).crossJoin(sb)
      .select(
        round(when(denom === 0.0, lit(1.0))
          .otherwise((col("sij").cast("double") - expected) / denom), 6)
          .as("ari"),
        col("nn").cast("long").as("n_obs"))
  }

  /** ROC operating points at FIXED thresholds for a binary problem:
    * one row per threshold with exact TP/FP counts and
    * TPR = TP/P, FPR = FP/N (predict positive iff score ≥ threshold).
    * The relational face of `deeplearning/evaluate.py:49-79`'s
    * roc_curve — fixed thresholds instead of every distinct score, so
    * the output is thresholds-sized regardless of corpus size.
    *
    * Scale shape: the (tiny, broadcast) threshold list cross-joins the
    * scored relation map-side; partial aggregation collapses each
    * partition to |thresholds| rows before the one |thresholds|-group
    * shuffle. Counts are exact longs; the two divisions are the only
    * float ops. `labelCol` must be 0/1; rows with null score or label
    * are excluded. */
  def rocPoints(df: DataFrame, labelCol: String, scoreCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val th = thresholds.toDF("threshold")
    val pos = col(labelCol) === 1
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .crossJoin(broadcast(th))
      .groupBy(col("threshold"))
      .agg(
        sum(when(pos && col(scoreCol) >= col("threshold"), 1L).otherwise(0L))
          .as("tp"),
        sum(when(!pos && col(scoreCol) >= col("threshold"), 1L).otherwise(0L))
          .as("fp"),
        sum(when(pos, 1L).otherwise(0L)).as("p"),
        sum(when(!pos, 1L).otherwise(0L)).as("n"))
      .select(col("threshold"),
        col("tp"), col("fp"),
        round(col("tp").cast("double") / col("p").cast("double"), 6).as("tpr"),
        round(col("fp").cast("double") / col("n").cast("double"), 6).as("fpr"))
  }

  /** Per-class ROC operating points, one-vs-rest — the multiclass
    * face of [[rocPoints]] and the exact shape of the reference's
    * per-class curves (`deeplearning/evaluate.py:49-79`): each class k
    * contributes its own curve with label `1{label = k}` scored by
    * that class's probability column. The per-class score columns are
    * MELTED map-side (one stack expression, rows × classes — the
    * standard long-form pivot, no joins), then the same
    * threshold-grouped count aggregation runs once over the melted
    * relation: one shuffle of |classes|·|thresholds| groups total,
    * regardless of corpus size.
    *
    * `classScores`: class value → its score column name. Output:
    * (class, threshold, tp, fp, tpr, fpr). */
  def rocPointsPerClass(df: DataFrame, labelCol: String,
      classScores: Seq[(String, String)],
      thresholds: Seq[Double]): DataFrame = {
    require(classScores.nonEmpty, "need at least one class")
    require(thresholds.nonEmpty, "need at least one threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val th = thresholds.toDF("threshold")
    // null labels are excluded BEFORE melting — same contract as the
    // binary [[rocPoints]] face (a null label is "unknown", not a
    // rest-class negative for every curve)
    val melted = df.filter(col(labelCol).isNotNull)
      .select(classScores.map { case (cls, scoreCol) =>
        struct(lit(cls).as("class"),
          when(col(labelCol) === cls, 1).otherwise(0).as("y"),
          col(scoreCol).cast("double").as("s")).as(s"__m_$cls")
      }: _*)
      .select(explode(array(classScores.map(c => col(s"__m_${c._1}")): _*))
        .as("m"))
      .select(col("m.class").as("class"), col("m.y").as("y"), col("m.s").as("s"))
    melted.filter(col("s").isNotNull)
      .crossJoin(broadcast(th))
      .groupBy(col("class"), col("threshold"))
      .agg(
        sum(when(col("y") === 1 && col("s") >= col("threshold"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("y") === 0 && col("s") >= col("threshold"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("p"),
        sum(when(col("y") === 0, 1L).otherwise(0L)).as("n"))
      .select(col("class"), col("threshold"), col("tp"), col("fp"),
        round(col("tp").cast("double") / col("p").cast("double"), 6).as("tpr"),
        round(col("fp").cast("double") / col("n").cast("double"), 6).as("fpr"))
  }

  /** Calibration (reliability) bins — "when the model says 0.8, does
    * it happen 80% of the time": scores in [0, 1] bucket into `bins`
    * equal-width bins, each reporting its exact count, mean predicted
    * score, and observed positive rate. The gap between the last two
    * columns IS the calibration error the ECE summarizes.
    *
    * One bins-group aggregation; the mean score sums grid-rounded
    * scores in DECIMAL (order-independent — a raw double sum would
    * flap the mean's last ulps across partitionings) with the two
    * divisions at the edge. Scores outside [0, 1] clamp into the edge
    * bins. */
  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
      bins: Int): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val d6 = org.apache.spark.sql.types.DecimalType(30, 6)
    val s = col(scoreCol).cast("double")
    val bin = least(greatest(floor(s * bins), lit(0.0)), lit(bins - 1.0))
      .cast("long")
    df.filter(s.isNotNull && col(labelCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(round(s, 6).cast(d6)).as("__ss"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("positives"))
      .select(col("bin"), col("n"), col("positives"),
        round(col("__ss").cast("double") / col("n").cast("double"), 6)
          .as("mean_score"),
        round(col("positives").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"))
  }

  /** Gini coefficient of a non-negative measure — the concentration
    * summary behind "top 1% of orders carry X% of revenue" (Lorenz
    * curve area, 0 = perfectly equal, →1 = one entity holds all).
    * Tie-aware exact rank formulation:
    *
    *   G = (2·Σᵥ v·(nᵥ·cumᵥ + nᵥ(nᵥ+1)/2) − (n+1)·Σv) / (n·Σv)
    *
    * where the sum runs over DISTINCT values (nᵥ rows, cumᵥ rows
    * strictly below) — tied ranks contribute identically under any
    * permutation, so the statistic is exact, not an average-rank
    * approximation. All sums accumulate in DECIMAL from grid-exact
    * inputs; the one division happens at the edge.
    *
    * Scale shape: one groupBy collapses the corpus to its distinct
    * values; the window runs over that bounded relation (the q133/q80
    * pattern — grid-quantize genuinely continuous measures first).
    * Negative values violate the Lorenz definition and are rejected
    * at runtime by a guard aggregate. Returns (gini, n). */
  def gini(df: DataFrame, valueCol: String): DataFrame = {
    // (18,6), not wider: decimal×BIGINT widens by 19 digits and must
    // stay ≤ 38 in BOTH engines (DuckDB errors past it, it doesn't
    // round) — 12 integer digits is plenty for a measure column
    val d6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 6)
    val v = giniValue(valueCol, d6)
    val g = df.filter(col(valueCol).isNotNull)
      .groupBy(v.as("__v"))
      .agg(count(lit(1)).as("__nv"))
    // the distinct-value relation is bounded by contract — the
    // pinned partition makes the single-task window intentional
    // (identical semantics, no spurious WindowExec scale warning)
    val w = Window.partitionBy(graft.plans.PinnedWindow.key(col("__v")))
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("__cum", coalesce(sum(col("__nv")).over(w), lit(0L)))
      .agg(
        min(col("__v")).as("__min"),
        sum((col("__v") * (col("__nv") * col("__cum") +
          expr("__nv * (__nv + 1) DIV 2"))).cast(d38)).as("__s"),
        sum((col("__v") * col("__nv")).cast(d38)).as("__t"),
        sum(col("__nv")).as("n"))
      .select(
        when(col("__min") < 0,
          raise_error(lit("gini: negative values violate the Lorenz definition")))
          .otherwise(
            round((lit(2.0) * col("__s").cast("double") -
              (col("n") + 1).cast("double") * col("__t").cast("double")) /
              (col("n").cast("double") * col("__t").cast("double")), 6))
          .as("gini"),
        col("n").cast("long").as("n"))
  }

  /** Per-group [[gini]] — concentration WITHIN each segment ("is
    * revenue as top-heavy in Europe as in Asia"). Same tie-aware
    * exact formulation, but every window is PARTITIONED by the group:
    * one shuffle on (group, value), no global single-task window —
    * the scale-native form (the global [[gini]] documents its
    * bounded-distinct-domain requirement; this one only needs each
    * group's distinct values to fit a task, which grouping already
    * implies). Negative values are rejected by the same guard.
    * Returns (group, gini, n). */
  def giniByGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val d6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 6)
    val v = giniValue(valueCol, d6)
    val g = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), v.as("__v"))
      .agg(count(lit(1)).as("__nv"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("__cum", coalesce(sum(col("__nv")).over(w), lit(0L)))
      .groupBy(col(groupCol))
      .agg(
        min(col("__v")).as("__min"),
        sum((col("__v") * (col("__nv") * col("__cum") +
          expr("__nv * (__nv + 1) DIV 2"))).cast(d38)).as("__s"),
        sum((col("__v") * col("__nv")).cast(d38)).as("__t"),
        sum(col("__nv")).as("n"))
      .select(col(groupCol),
        when(col("__min") < 0,
          raise_error(lit("gini: negative values violate the Lorenz definition")))
          .otherwise(
            round((lit(2.0) * col("__s").cast("double") -
              (col("n") + 1).cast("double") * col("__t").cast("double")) /
              (col("n").cast("double") * col("__t").cast("double")), 6))
          .as("gini"),
        col("n").cast("long").as("n"))
  }

  /** Dense confusion matrix — rows = true label, one column per
    * predicted class, zero-filled (`confusion_matrix`,
    * `deeplearning/evaluate.py:43-44`): SQUARE over the UNION of
    * observed label and prediction classes, sklearn's convention (a
    * class the model never predicts still gets its zero column; a
    * class it hallucinates gets a zero row).
    *
    * Scale shape: one count aggregation over (label, pred) — the
    * contingency reduction — then a pivot over the driver-known class
    * list (k classes, collected once; class domains are tiny by the
    * same contract as every encoder here — and that contract is
    * ENFORCED: the collect is probe-capped at `maxClasses`, so a
    * high-cardinality column passed as a "class" fails fast with a
    * clear message instead of silently OOMing the driver). Cells are
    * exact longs. */
  def confusionMatrix(df: DataFrame, labelCol: String,
      predCol: String, maxClasses: Int = 10000): DataFrame = {
    require(maxClasses >= 1, "maxClasses must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df
      .filter(col(labelCol).isNotNull && col(predCol).isNotNull)
      .select(col(labelCol).cast("string").as("label"),
        col(predCol).cast("string").as("pred"))
    // probe-cap idiom (EsiEtl.scala dim probe): fetch cap+1, and if the
    // domain exceeds the cap, refuse — a confusion matrix over an
    // ID-like column is a caller bug, not a bigger matrix
    val probe = base.select(col("label"))
      .union(base.select(col("pred")))
      .distinct().limit(maxClasses + 1).collect()
    if (probe.length > maxClasses)
      throw new IllegalArgumentException(
        s"confusionMatrix: more than $maxClasses distinct classes in " +
          s"'$labelCol' union '$predCol' — this operator is for bounded " +
          "class domains; raise maxClasses only if the domain is truly a " +
          "class set, not an identifier")
    val classes = probe.map(_.getString(0)).sorted.toSeq
    val pivoted = base.groupBy(col("label"))
      .pivot("pred", classes)
      .agg(count(lit(1)))
    classes.toDF("label")
      .join(pivoted, Seq("label"), "left")
      .na.fill(0L, classes)
      .orderBy("label")
  }

  /** Regression evaluation report — MSE, RMSE, MAE, R²
    * (`machineLearning.py:624-626`'s mean_squared_error / r2_score) as
    * one aggregation pass each side of the mean: per-row residual
    * terms are grid-rounded to 9 decimals and summed in DECIMAL (the
    * order-independent summation recipe — a raw double sum would make
    * the report flap across partitionings and engines), with the
    * float divisions at the edge. ȳ itself derives from an exact
    * decimal sum of the targets. Two scans total (mean, then moments)
    * — the unavoidable minimum for R² without a streaming-variance
    * formulation whose merges are order-dependent. Null target or
    * prediction rows are excluded.
    *
    * Returns one row: (n, mse, rmse, mae, r2). Constant targets
    * (zero total variance) yield null R², the try_divide convention. */
  def regressionReport(df: DataFrame, yCol: String,
      predCol: String): DataFrame = {
    val d6 = org.apache.spark.sql.types.DecimalType(30, 6)
    val d9 = org.apache.spark.sql.types.DecimalType(38, 9)
    val y = col(yCol).cast("double")
    val p = col(predCol).cast("double")
    val base = df.filter(y.isNotNull && p.isNotNull)
    val stats = base.agg(count(lit(1)).as("__n"),
      sum(round(y, 6).cast(d6)).as("__sy"))
    val mean = col("__sy").cast("double") / col("__n").cast("double")
    val res = y - p
    val dev = y - mean
    val agg = base.crossJoin(broadcast(stats))
      .agg(
        first(col("__n")).as("n"),
        sum(round(res * res, 9).cast(d9)).cast("double").as("ssres"),
        sum(round(abs(res), 9).cast(d9)).cast("double").as("sae"),
        sum(round(dev * dev, 9).cast(d9)).cast("double").as("sstot"))
    val mse = col("ssres") / col("n").cast("double")
    agg.select(col("n"),
      round(mse, 6).as("mse"),
      round(sqrt(mse), 6).as("rmse"),
      round(col("sae") / col("n").cast("double"), 6).as("mae"),
      round(lit(1.0) - try_divide(col("ssres"), col("sstot")), 6).as("r2"))
  }

  /** Exact binary AUC as the Mann–Whitney rank statistic — identical
    * to integrating the full ROC curve over every distinct score, with
    * average ranks for ties (sklearn's roc_auc_score semantics):
    *
    *   AUC = (Σ_s p_s·(2·cum_s + n_s + 1) − P(P+1)) / (2·P·N)
    *
    * where the sum runs over distinct scores s (n_s rows, p_s
    * positives, cum_s rows strictly below). The numerator is EXACT
    * integer arithmetic end to end — doubling the rank sum clears the
    * half-rank ties — so the statistic is bit-stable across engines.
    *
    * Scale shape: one groupBy collapses the corpus to its distinct
    * scores; the global window runs over that bounded relation (the
    * q80 contingency pattern). Scores should be grid-quantized first
    * when their domain is unbounded — at 100 TB a raw-float score
    * column would make the "distinct scores" relation corpus-sized.
    * Returns one row: (auc, positives, negatives). */
  def aucBinary(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val g = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("ns"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("ps"))
    // bounded distinct-score relation by contract (see above) — the
    // pinned partition marks the single-task window intentional
    val w = Window.partitionBy(graft.plans.PinnedWindow.key(col("__s")))
      .orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cb", coalesce(sum(col("ns")).over(w), lit(0L)))
      .agg(
        sum(col("ps") * (col("cb") * 2 + col("ns") + 1)).as("num2"),
        sum(col("ps")).as("p"),
        sum(col("ns") - col("ps")).as("n"))
      .select(
        // try_divide, not `/`: with a single class present the divisor
        // is 0 and ANSI mode (Spark 4 default) would throw an opaque
        // DIVIDE_BY_ZERO here — the undefined-AUC contract is a NULL
        // that callers (Drivers.binaryAuc) turn into a clear error
        round(try_divide(
          (col("num2") - col("p") * (col("p") + 1)).cast("double"),
          lit(2.0) * col("p").cast("double") * col("n").cast("double")), 6)
          .as("auc"),
        col("p").cast("long").as("positives"),
        col("n").cast("long").as("negatives"))
  }

  /** Retrieval recall: |got ∩ truth| / |truth| over two result-id
    * relations — the ANN quality gauge ("measure, don't guess": an
    * approximate index without a measured recall is a bug that hasn't
    * happened yet). Both inputs are top-k result sets (id column, any
    * other columns ignored); duplicates collapse before counting.
    *
    * Scale shape: the overlap is a LEFT SEMI join of two k-sized
    * relations and each count is a 1-row aggregate — the crossJoin of
    * 1-row frames is the scalar-broadcast pattern, never a data-sized
    * cartesian. Returns one row: (k = |truth|, hits, recall to 6
    * places; recall NULL when truth is empty). */
  def recallAtK(got: DataFrame, truth: DataFrame,
      idCol: String): DataFrame = {
    val t = truth.select(col(idCol)).distinct()
    val hits = got.select(col(idCol)).distinct()
      .join(t, Seq(idCol), "left_semi")
      .agg(count(lit(1)).as("hits"))
    t.agg(count(lit(1)).as("k")).crossJoin(hits)
      .select(col("k"), col("hits"),
        round(try_divide(col("hits"), col("k")), 6).as("recall"))
  }

  /** Per-bin Population Stability Index terms between a reference and
    * a current sample of `valueCol` — the model-monitoring drift
    * statistic (Siddiqi's credit-scoring formulation): values land in
    * `bins` fixed-width bins over [lo, hi) (outliers clamp to the edge
    * bins, NULLs excluded), each side's bin shares are
    * Laplace-smoothed with a half count so an empty bin contributes a
    * finite term instead of ±∞, and
    *
    *   PSI = Σ_b (p_b − q_b) · ln(p_b / q_b).
    *
    * Fixed, caller-supplied edges — not per-run quantiles — are what
    * make the statistic comparable across monitoring runs (and
    * engines). Terms follow the q116 determinism recipe: round(…,9)
    * then an order-independent DECIMAL sum.
    *
    * Scale shape: each side is ONE map-side-combined aggregation to a
    * bins-sized relation; the bin spine is a `spark.range(bins)`
    * broadcast, so bins empty on both sides still appear (term 0 after
    * smoothing — and their presence keeps the report's shape fixed). */
  def psiBins(ref: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0 && hi > lo, "psi needs bins > 0 and hi > lo")
    def binned(df: DataFrame, out: String): DataFrame = {
      val v = col(valueCol).cast("double")
      val raw = floor((v - lo) / (hi - lo) * bins).cast("long")
      df.filter(v.isNotNull)
        .select(least(greatest(raw, lit(0L)), lit(bins - 1L)).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(out))
    }
    val spark = ref.sparkSession
    val spine = spark.range(bins).toDF("bin")
    // side totals via a pinned window over the bins-sized spine — ONE
    // scan per side (a broadcast-total crossJoin would duplicate the
    // whole per-side aggregation subtree in the plan)
    val wAll = Window.partitionBy(graft.plans.PinnedWindow.key(col("bin")))
    spine
      .join(binned(ref, "ref_cnt"), Seq("bin"), "left")
      .join(binned(cur, "cur_cnt"), Seq("bin"), "left")
      .na.fill(0L, Seq("ref_cnt", "cur_cnt"))
      .withColumn("p", (col("ref_cnt") + lit(0.5))
        / (sum(col("ref_cnt")).over(wAll) + lit(0.5) * bins))
      .withColumn("q", (col("cur_cnt") + lit(0.5))
        / (sum(col("cur_cnt")).over(wAll) + lit(0.5) * bins))
      .select(col("bin"), col("ref_cnt"), col("cur_cnt"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 9)
          .as("term"))
  }

  /** One-row PSI report: (n_ref, n_cur, psi). Rule of thumb the
    * monitoring literature uses: < 0.1 stable, 0.1–0.25 moderate
    * shift, > 0.25 retrain. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    val d9 = org.apache.spark.sql.types.DecimalType(28, 9)
    psiBins(ref, cur, valueCol, bins, lo, hi).agg(
      sum(col("ref_cnt")).as("n_ref"),
      sum(col("cur_cnt")).as("n_cur"),
      round(sum(col("term").cast(d9)).cast("double"), 6).as("psi"))
  }
}
