package graft.privacy

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification risk audit over quasi-identifier (QI) columns —
  * the privacy gate a curated corpus or warehouse extract passes
  * before leaving the boundary.
  *
  * The reference has no privacy surface (its ETL publishes raw
  * dimensions, `etl_final.ktr`); this extends the training-data
  * pipeline: released data whose QI combination (e.g. nation ×
  * market segment) isolates fewer than k rows lets an adversary who
  * knows those attributes re-identify individuals (Sweeney's
  * k-anonymity), and a group whose sensitive attribute takes < l
  * distinct values leaks it even without row identification
  * (Machanavajjhala's l-diversity).
  *
  * Shape at 100 TB: ONE shuffle on the QI key to the per-group
  * relation (count + distinct-sensitive per group — partial
  * aggregation combines map-side), then a one-row reduce over the
  * groups relation. Nothing is collected; group count is bounded by
  * the QI domain product, and even an ID-like QI (worst case: every
  * row its own group) stays fully distributed.
  */
object Anonymity {

  /** Per-QI-group equivalence-class profile: group size and sensitive
    * diversity, ordered smallest (riskiest) first. NULL QI values form
    * their own class (an adversary observes "missing" too). */
  def equivalenceClasses(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity needs at least one QI column")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
  }

  /** One-row audit report.
    *
    * @param k the anonymity threshold the release must meet
    * @return n_rows, n_classes, k_anonymity (min class size — the
    *         dataset IS k-anonymous for this k), classes_below_k,
    *         rows_at_risk (rows living in sub-k classes), risk_frac,
    *         min_l_diversity (worst sensitive-attribute diversity)
    */
  def audit(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      k: Long): DataFrame =
    equivalenceClasses(df, qiCols, sensitiveCol).agg(
      sum(col("class_size")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      min(col("class_size")).as("k_anonymity"),
      sum(when(col("class_size") < k, 1L).otherwise(0L))
        .as("classes_below_k"),
      sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
        .as("rows_at_risk"),
      round(sum(when(col("class_size") < k, col("class_size"))
          .otherwise(0L)) / sum(col("class_size")).cast("double"), 6)
        .as("risk_frac"),
      min(col("l_diversity")).as("min_l_diversity"))
}
