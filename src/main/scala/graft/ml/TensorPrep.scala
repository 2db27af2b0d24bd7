package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native tensor preparation — the reference's deep-learning
  * encoder pipeline (`deeplearning/preprocessing.py:13-47` fit,
  * `deeplearning/etl_to_tensor.py:38-71` transform): label-encode the
  * categoricals and the target with sklearn-`LabelEncoder` parity
  * (codes = rank in SORTED string order — NOT the frequency order of
  * `Features.labelEncoding`/StringIndexer), standardize the numerics,
  * emit fixed-width `x_num: array<float>` / `x_cat: array<bigint>` /
  * `y: bigint` columns — the A11 "tensor sink" made concrete: the
  * frame writes to parquet and any training loop consumes columnar
  * batches from there.
  *
  * Scale shape: fitting is one distinct per categorical (encoder
  * domains are dim-small by contract) plus one scalar aggregation for
  * all numeric stats; transforming is pure map-side expression work —
  * codes resolve through broadcast map literals, never a join. Unknown
  * categorical values at transform time encode to 0, the reference's
  * unknown-token convention (`etl_to_tensor.py:57-60`); rows with a
  * null target are dropped (`preprocessing.py:14`).
  *
  * Encoders persist as plain parquet mapping tables ([[save]]/[[load]]
  * — the joblib dump/load analog, engine-readable by anything).
  */
object TensorPrep {

  final case class Encoders(targetCol: String, catCols: Seq[String],
      numCols: Seq[String],
      catCodes: Map[String, Map[String, Long]],
      targetCodes: Map[String, Long],
      numStats: Map[String, (Double, Double)])

  /** Fit encoders on `df`: alphabetical label codes per categorical
    * (and the target), mean/sample-std per numeric (the q14/`Features
    * .standardize` convention). */
  def fit(df: DataFrame, targetCol: String, catCols: Seq[String],
      numCols: Seq[String]): Encoders = {
    val data = df.filter(col(targetCol).isNotNull)
    def codesOf(c: String): Map[String, Long] =
      data.select(col(c).cast("string")).filter(col(c).isNotNull)
        .distinct().collect().map(_.getString(0))
        .sorted.zipWithIndex.map { case (v, i) => v -> i.toLong }.toMap
    val stats: Map[String, (Double, Double)] = if (numCols.isEmpty) Map.empty
    else {
      val aggs = numCols.flatMap(c => Seq(
        avg(col(c).cast("double")).as(s"${c}_m"),
        stddev_samp(col(c).cast("double")).as(s"${c}_sd")))
      val row = data.agg(aggs.head, aggs.tail: _*).head()
      numCols.zipWithIndex.map { case (c, i) =>
        c -> ((row.getDouble(2 * i), row.getDouble(2 * i + 1)))
      }.toMap
    }
    Encoders(targetCol, catCols, numCols,
      catCols.map(c => c -> codesOf(c)).toMap, codesOf(targetCol), stats)
  }

  /** Apply fitted encoders: drops null-target rows, appends
    * `x_num`/`x_cat`/`y`. Codes come from broadcast map literals
    * (`element_at` on a map returns null for misses — ANSI-safe), so
    * the whole transform is one codegen'd projection. */
  def transform(df: DataFrame, enc: Encoders): DataFrame = {
    def codeExpr(c: String, codes: Map[String, Long]) =
      if (codes.isEmpty) lit(0L)
      else coalesce(element_at(typedLit(codes), col(c).cast("string")), lit(0L))
    val xNum = array(enc.numCols.map { c =>
      val (m, sd) = enc.numStats(c)
      ((col(c).cast("double") - lit(m)) / lit(sd)).cast("float")
    }: _*)
    val xCat = array(enc.catCols.map(c => codeExpr(c, enc.catCodes(c))): _*)
    df.filter(col(enc.targetCol).isNotNull)
      .withColumn("x_num", xNum)
      .withColumn("x_cat", xCat)
      .withColumn("y", codeExpr(enc.targetCol, enc.targetCodes))
  }

  /** Persist the encoders as parquet mapping tables under `path`:
    * `cat_codes` (col, value, code), `target_codes` (value, code),
    * `num_stats` (col, mean, std), `meta` (target, cat/num col lists). */
  def save(spark: SparkSession, enc: Encoders, path: String): Unit = {
    import spark.implicits._
    enc.catCols.flatMap(c => enc.catCodes(c).toSeq.map { case (v, i) => (c, v, i) })
      .toDF("col", "value", "code")
      .write.mode("overwrite").parquet(s"$path/cat_codes")
    enc.targetCodes.toSeq.toDF("value", "code")
      .write.mode("overwrite").parquet(s"$path/target_codes")
    enc.numCols.map(c => (c, enc.numStats(c)._1, enc.numStats(c)._2))
      .toDF("col", "mean", "std")
      .write.mode("overwrite").parquet(s"$path/num_stats")
    Seq((enc.targetCol, enc.catCols.mkString(","), enc.numCols.mkString(",")))
      .toDF("target", "cats", "nums")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def load(spark: SparkSession, path: String): Encoders = {
    val meta = spark.read.parquet(s"$path/meta").head()
    def split(s: String): Seq[String] =
      if (s.isEmpty) Seq.empty else s.split(",").toSeq
    val catCols = split(meta.getString(1))
    val numCols = split(meta.getString(2))
    val cats = spark.read.parquet(s"$path/cat_codes").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (c, rows) =>
        c -> rows.map(r => r._2 -> r._3).toMap
      }
    val target = spark.read.parquet(s"$path/target_codes").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val stats = spark.read.parquet(s"$path/num_stats").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    Encoders(meta.getString(0), catCols, numCols,
      catCols.map(c => c -> cats.getOrElse(c, Map.empty[String, Long])).toMap,
      target, stats)
  }
}
