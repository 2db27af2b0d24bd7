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

  /** Fit encoders on `df` in ONE scan: `collect_set` gathers every
    * encoder domain (dim-small by contract — the same contract the
    * star-schema dims live under) alongside the numeric moments in a
    * single aggregation, instead of one scan per column. Codes are
    * alphabetical per sklearn-LabelEncoder; stats are mean/sample-std
    * (the q14/`Features.standardize` convention).
    *
    * Degenerate inputs stay usable: a null aggregate (single-row fit,
    * all-null column, empty frame) yields mean 0 / std 0, and std 0
    * means "scale by 1" at transform time — sklearn's zero-variance
    * behavior — rather than an ANSI DIVIDE_BY_ZERO crash. */
  def fit(df: DataFrame, targetCol: String, catCols: Seq[String],
      numCols: Seq[String]): Encoders = {
    val data = df.filter(col(targetCol).isNotNull)
    val domainCols = catCols :+ targetCol
    val aggs = domainCols.map(c => collect_set(col(c).cast("string")).as(s"__s_$c")) ++
      numCols.flatMap(c => Seq(
        avg(col(c).cast("double")).as(s"__m_$c"),
        stddev_samp(col(c).cast("double")).as(s"__sd_$c")))
    val row = data.agg(aggs.head, aggs.tail: _*).head()
    // sort by CODE POINT, not Scala's default UTF-16 code-unit order:
    // sklearn LabelEncoder (np.unique) and the DuckDB oracle's ORDER BY
    // both sort binary/code-point — supplementary-plane values diverge
    // under the default String ordering (same hazard as EsiEtl's cmp)
    val codePointOrd: Ordering[String] = (xs: String, ys: String) =>
      java.util.Arrays.compare(xs.codePoints().toArray, ys.codePoints().toArray)
    def codesAt(i: Int): Map[String, Long] =
      row.getSeq[String](i).sorted(codePointOrd).zipWithIndex
        .map { case (v, j) => v -> j.toLong }.toMap
    def numAt(i: Int): Double =
      if (row.isNullAt(i)) 0.0 else row.getDouble(i)
    val base = domainCols.size
    Encoders(targetCol, catCols, numCols,
      catCols.zipWithIndex.map { case (c, i) => c -> codesAt(i) }.toMap,
      codesAt(catCols.size),
      numCols.zipWithIndex.map { case (c, i) =>
        c -> ((numAt(base + 2 * i), numAt(base + 2 * i + 1)))
      }.toMap)
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
      // zero-variance column: scale by 1 (sklearn StandardScaler
      // convention) — a plain /0.0 would throw under ANSI mode
      val scale = if (sd == 0.0) 1.0 else sd
      ((col(c).cast("double") - lit(m)) / lit(scale)).cast("float")
    }: _*).cast("array<float>") // empty array() is array<void> otherwise
    val xCat = array(enc.catCols.map(c => codeExpr(c, enc.catCodes(c))): _*)
      .cast("array<bigint>")
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
    // column lists as ROWS (kind, name, pos) — a delimited string would
    // corrupt on any column name containing the delimiter
    (Seq(("target", enc.targetCol, 0)) ++
      enc.catCols.zipWithIndex.map { case (c, i) => ("cat", c, i) } ++
      enc.numCols.zipWithIndex.map { case (c, i) => ("num", c, i) })
      .toDF("kind", "name", "pos")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def load(spark: SparkSession, path: String): Encoders = {
    val metaRows = spark.read.parquet(s"$path/meta").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    def colsOf(kind: String): Seq[String] =
      metaRows.filter(_._1 == kind).sortBy(_._3).map(_._2).toSeq
    val catCols = colsOf("cat")
    val numCols = colsOf("num")
    val targetCol = colsOf("target").head
    val cats = spark.read.parquet(s"$path/cat_codes").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (c, rows) =>
        c -> rows.map(r => r._2 -> r._3).toMap
      }
    val target = spark.read.parquet(s"$path/target_codes").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val stats = spark.read.parquet(s"$path/num_stats").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    Encoders(targetCol, catCols, numCols,
      catCols.map(c => c -> cats.getOrElse(c, Map.empty[String, Long])).toMap,
      target, stats)
  }
}
