package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the reference's operational store is PostgreSQL
  * (`docker-compose.yaml:3-18`); its ETL reads star-join SQL through it
  * (`machineLearning.py:227-246`) and writes facts with batched
  * TableOutput commits of 1,000 rows (`etl_final.ktr:3024,3027`).
  *
  * No database runs in the build container, so these wrappers are
  * compile-checked parameterizations of Spark's built-in JDBC relation
  * (they add no custom protocol code); the parquet warehouse
  * ([[Warehouse]], `graft.etl.EsiEtl.save`) is the native path.
  */
object Jdbc {

  private def props(user: String, password: String): Properties = {
    val p = new Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p
  }

  /** Whole-table (or pushed-down `query`) scan on one connection —
    * A4. Fine for dims; use [[readPartitioned]] for anything big. */
  def read(spark: SparkSession, url: String, table: String,
      user: String, password: String): DataFrame =
    spark.read.jdbc(url, table, props(user, password))

  /** Range-partitioned parallel scan — `numPartitions` concurrent
    * connections, each reading one stride of `partitionColumn`. This is
    * the only JDBC read shape that scales: a single-connection scan
    * serializes the whole table through one executor. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, user: String, password: String): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props(user, password))

  /** Batched append sink — A7: JDBC batch inserts, 1,000 rows per
    * round-trip like the reference's TableOutput commit size. */
  def writeAppend(df: DataFrame, url: String, table: String,
      user: String, password: String, batchSize: Int = 1000): Unit =
    df.write.mode(SaveMode.Append)
      .option("batchsize", batchSize)
      .jdbc(url, table, props(user, password))
}
