package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line. Results are forced
  * through the `noop` sink (full computation of every output column —
  * unlike `count()`, which would let Catalyst prune the aggregates
  * away).
  *
  * Protocol: one untimed warmup pass on the smallest scale factor pays
  * the per-plan one-time costs (whole-stage codegen compilation, JIT of
  * the generated classes, parquet footer caches) that would otherwise
  * be charged entirely to whichever query runs first; then three timed
  * passes on the target scale factor, reporting the per-query minimum —
  * the standard steady-state measurement for a long-lived engine under
  * bursty host noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions) // strategy for SkylinePlan (q100) + native SQL fns
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a failed query must NOT fold its (short) elapsed time into the
    // metric — a regression would read as a speedup; report a large
    // sentinel so breakage inflates the tracked number instead
    val FailedSentinel = 1e6
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED on $dir: ${e.getMessage}")
        FailedSentinel
      }
    }

    // SPARK_GRAFT_BENCH_ONLY=q36_esi_etl,... isolates queries under the
    // same protocol (warmup + min-of-3) — for profiling, not the driver
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(f) =>
        val only = f.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = only -- Queries.benchNames.toSet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_ONLY names not in benchNames: ${unknown.mkString(", ")}")
        Queries.benchNames.filter(only)
      case None => Queries.benchNames
    }
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      names.foreach(run(_, warmDir)) // untimed
    // three timed passes, per-query minimum: the host shows bursty
    // co-tenant noise (identical binaries vary 2-3×), and min-of-N is
    // the standard steady-state estimator under asymmetric noise
    val passes = (1 to 3).map(_ => names.map(n => n -> run(n, sfDir)).toMap)
    val results = names.map(n => n -> passes.map(_(n)).min)

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // the authoritative JSON line must be the LAST thing on the
    // combined stream: a tail-capture harness greps it from the end,
    // and Spark's stop() writes shutdown INFO lines AFTER anything
    // printed before it — every earlier round's driver capture lost
    // the line exactly that way (BENCH_r*.json: parsed null, tail full
    // of BlockManager logs). The pre-stop safety copy (in case stop()
    // hangs) is marked "provisional" so a parse-every-line consumer
    // can dedupe instead of double-counting the run.
    println(json.patch(1, "\"provisional\":true,", 0))
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(json)
    System.out.flush()
  }
}
