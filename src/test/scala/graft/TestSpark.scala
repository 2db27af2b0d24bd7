package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared test session: one JVM (Test/fork), one SparkSession. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf: String = "/root/testdata/sf0.001"

  def table(name: String): DataFrame =
    spark.read.parquet(s"$sf/$name.parquet")
}
