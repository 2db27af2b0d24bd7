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
      // mirror the Verify/Bench sessions: the SkylinePlan strategy must
      // be present for q100's native path, and lint must see the plans
      // the driver's sessions will actually run
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf: String = "/root/testdata/sf0.001"

  def table(name: String): DataFrame =
    spark.read.parquet(s"$sf/$name.parquet")

  /** Order-free comparison form: columns sorted by name, rows sorted
    * by their joined string — shared by the olap specs so the two
    * sides of an equivalence assert can differ in column AND row
    * order. */
  def sortedRows(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
  }
}
