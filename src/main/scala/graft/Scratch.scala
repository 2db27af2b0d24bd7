package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling/debug entry point — not part of the engine. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions) // native plan strategies
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val name = if (args.length > 1) args(1) else "q01_pricing"
    val df = Queries.all(name)(spark, dir)
    if (args.length > 2 && args(2) == "explain") df.explain("formatted")
    else if (args.length > 2 && args(2) == "dump") {
      require(args.length > 3, "dump mode needs an output path argument")
      df.write.mode("overwrite").parquet(args(3))
    } else df.show(10, truncate = false)
    spark.stop()
  }
}
