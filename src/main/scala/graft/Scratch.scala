package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.{Cleaning, EsiEtl}
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"== $l: ${(System.nanoTime() - t0) / 1e9}s"); r
    }
    val o = spark.read.parquet(s"$dir/orders.parquet").repartition(32)
    val raw = o.select(
      when(col("o_orderstatus") === "O", lit(" Entrada "))
        .otherwise(lit("salida")).as("tip_movi"),
      year(col("o_orderdate")).as("anio_movi"),
      Cleaning.valueMap(month(col("o_orderdate")).cast("string"),
        Cleaning.monthNamesEs).as("mes_movi"),
      dayofmonth(col("o_orderdate")).as("dia_movi"),
      when(col("o_orderkey") % 2 === 0, "M").otherwise("F").as("sex_migr"),
      col("o_orderpriority").as("nac_migr"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "aerea")
        .when(col("o_orderpriority") === "3-MEDIUM", "terrestre")
        .otherwise("maritima").as("via_tran"),
      concat(lit(" jef-"), (col("o_custkey") % 5).cast("string")).as("jef_migr"),
      concat(lit("pro-"), (col("o_custkey") % 3).cast("string")).as("pro_jefm"),
      concat(lit("can-"), (col("o_custkey") % 4).cast("string")).as("can_jefm"),
      when(col("o_orderkey") % 11 === 0, "Estudiante")
        .when(col("o_orderkey") % 11 === 1, "INGENIERO")
        .otherwise("viajero frecuente").as("ocu_migr"),
      when(col("o_orderkey") % 7 === 0, lit("sin especificar"))
        .otherwise((col("o_custkey") % 80 + 1).cast("string")).as("edad"))
    for (i <- 1 to 2) {
      time(s"[$i] clean+count")(EsiEtl.clean(raw).count())
      val wh = time(s"[$i] buildWarehouse (dims collect)")(
        EsiEtl.buildWarehouse(EsiEtl.clean(raw)))
      time(s"[$i] fact_in count")(wh.factInmigrante.count())
      time(s"[$i] full q36")(Queries.all("q36_esi_etl")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
