package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (see TESTDATA.md).
  *
  * All tables are plain parquet; Spark's vectorized reader + Catalyst
  * column pruning / predicate pushdown apply automatically, so callers
  * should `.select`/`.filter` as early as possible and let the optimizer
  * push into the scan (verify with `.explain("formatted")` →
  * `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` mirrors the
    * DuckDB oracle's view of the world. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
