package graft.ml

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DriversSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cluster: k cells, all rows assigned, silhouette in range, seeded-stable") {
    val customer = TestSpark.table("customer")
    val r = Drivers.cluster(customer, Seq("c_acctbal", "c_nationkey"), k = 3)
    assert(r.sizes.keySet.subsetOf(Set(0, 1, 2)) && r.sizes.nonEmpty)
    assert(r.sizes.values.sum === customer.count())
    assert(r.silhouette >= -1.0 && r.silhouette <= 1.0)
    val again = Drivers.cluster(customer, Seq("c_acctbal", "c_nationkey"), k = 3)
    assert(again.sizes === r.sizes) // seed 42 ⇒ reproducible
  }

  test("classify: held-out accuracy is a sane probability, predictions typed") {
    val li = TestSpark.table("lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_discount"), col("l_shipdate"))
      .withColumn("ship_year", year(col("l_shipdate")).cast("double"))
    // l_returnflag is decidable from shipdate year in TPC-H-ish data:
    // a genuinely learnable target, so accuracy must beat the prior
    val r = Drivers.classify(li, "l_returnflag",
      categoricalCols = Seq("l_linestatus"),
      numericCols = Seq("l_quantity", "l_discount", "ship_year"))
    assert(r.accuracy >= 0.0 && r.accuracy <= 1.0)
    assert(r.predictions.count() > 0)
    val majority = li.groupBy("l_returnflag").count()
      .agg(max("count")).head.getLong(0).toDouble / li.count()
    assert(r.accuracy >= majority * 0.9,
      s"accuracy ${r.accuracy} should approach the majority prior $majority")
  }

  test("olsFit recovers a known linear relationship exactly") {
    val df = (1 to 50).map(i => (i.toDouble, 3.5 * i + 7.0)).toDF("x", "y")
    val row = Drivers.olsFit(df, col("x"), col("y")).head
    assert(math.abs(row.getDouble(0) - 3.5) < 1e-9)
    assert(math.abs(row.getDouble(1) - 7.0) < 1e-9)
  }

  test("forecastDaily emits horizon rows continuing the trend") {
    val daily = (1 to 20)
      .map(i => (java.sql.Date.valueOf(f"2024-01-$i%02d"), i.toLong * 2))
      .toDF("d", "c")
    val out = Drivers.forecastDaily(daily, "d", "c", horizon = 5)
      .orderBy("d").collect()
    assert(out.length === 5)
    assert(out.head.getDate(0).toString === "2024-01-21")
    // exact line c = 2·day-index ⇒ prediction for day 21 is 42
    assert(math.abs(out.head.getDouble(1) - 42.0) < 1e-6)
  }
}
