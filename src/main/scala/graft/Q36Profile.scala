package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.EsiEtl

/** Ad-hoc stage-level profiler for q36_esi_etl — not part of the
  * engine. Decomposes the benched query into its pipeline phases and
  * min-of-N times each in the same session shape as [[Bench]]
  * (local[32], AQE on, GraftExtensions, noop sink), so the cost of the
  * three-round bench drift can be pinned to a stage instead of guessed.
  *
  * Phases (cumulative pipeline prefixes, except the dim build which is
  * an isolated action):
  *   - `scan_clean`   scan + cleaning chain only (noop)
  *   - `dim_build`    buildWarehouse: GROUPING SETS distincts + probe
  *                    collect + driver-side sort/id assignment
  *   - `facts`        dim build + 5 broadcast FK joins + router +
  *                    facts persist (noop both fact branches)
  *   - `full_q36`     the exact benched query (noop)
  *   - `full_nopersist` q36 tail rebuilt WITHOUT the facts persist —
  *                    isolates the MEMORY_AND_DISK materialization cost
  *                    (the tail re-runs the clean+join chain per branch)
  *
  * Usage: `sbt "runMain graft.Q36Profile [sfDir] [nRuns]"`.
  */
object Q36Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def minOf(label: String)(f: => Unit): Double = {
      f // warmup (codegen compile, JIT, parquet footers)
      val ts = (1 to n).map { _ =>
        spark.catalog.clearCache() // each run pays its own persists
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[q36prof] $label%-15s min=${ts.head}%6.3f  med=${ts(n / 2)}%6.3f  max=${ts.last}%6.3f  n=$n")
      ts.head
    }

    minOf("scan_clean") { noop(EsiEtl.clean(Queries.q36Raw(spark, dir))) }
    minOf("dim_build") { EsiEtl.buildWarehouse(EsiEtl.clean(Queries.q36Raw(spark, dir))) }
    minOf("facts") {
      val wh = EsiEtl.buildWarehouse(EsiEtl.clean(Queries.q36Raw(spark, dir)))
      noop(wh.factInmigrante); noop(wh.factEmigrante)
    }
    minOf("full_q36") { noop(Queries.q36EsiEtl(spark, dir)) }
    minOf("full_nopersist") {
      val cleaned = EsiEtl.clean(Queries.q36Raw(spark, dir))
      val wh = EsiEtl.buildWarehouse(cleaned)
      // rebuild the fact stream from the UNPERSISTED cleaning chain:
      // same five broadcast joins + router predicates, no
      // MEMORY_AND_DISK write/read of the resolved projection
      val resolved = EsiEtl.dimSpecs.foldLeft(cleaned) {
        case (acc, (name, keys, id)) =>
          graft.etl.SurrogateKeys.resolve(acc, wh.dims(name), keys, id)
      }
      val factCols = Seq("tip_movi", "edad") ++ EsiEtl.dimSpecs.map(_._3)
      val facts0 = resolved.select(factCols.map(col): _*)
      val in = facts0.filter(col("tip_movi") === "entrada").drop("tip_movi")
      val out = facts0.filter(!(col("tip_movi") <=> "entrada")).drop("tip_movi")
      val facts = in.withColumn("fact", lit("inmigrante"))
        .unionByName(out.withColumn("fact", lit("emigrante")))
      noop(facts
        .join(broadcast(wh.dims("dim_transporte")), Seq("id_transporte"))
        .join(broadcast(wh.dims("dim_persona")), Seq("id_persona"))
        .join(broadcast(wh.dims("dim_fecha")), Seq("id_fecha"))
        .groupBy(col("fact"), col("mes_movi"), col("via_tran"), col("sex_migr"))
        .agg(count(lit(1)).as("cnt"),
          round(Queries.dmeanForProfiler(col("edad")), 6).as("avg_edad"))
        .orderBy("fact", "mes_movi", "via_tran", "sex_migr"))
    }
    spark.stop()
  }
}
