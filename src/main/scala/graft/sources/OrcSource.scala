package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink face — completes the columnar-format matrix
  * (parquet is the primary warehouse format; ORC is the interop
  * surface for Hive-lineage lakes). Spark's builtin ORC datasource
  * provides the same scan-time machinery the parquet path relies on —
  * predicate pushdown into stripe/row-group indexes, column pruning,
  * vectorized reads — all asserted in `OrcSourceSpec`, so the
  * engine's pushdown guarantees hold regardless of which columnar
  * format a deployment lands on.
  *
  * Snappy is the default codec to match the parquet sink
  * (`EsiEtl.save`); zstd is the cold-storage option.
  */
object OrcSource {

  def write(df: DataFrame, path: String,
      compression: String = "snappy"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .orc(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
