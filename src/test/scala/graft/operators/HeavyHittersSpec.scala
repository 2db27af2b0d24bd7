package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matches the exact GROUP BY/HAVING plan on a zipfish stream") {
    // item i appears 2000/i times — plenty of mass above and below any
    // threshold; capacity 10 → threshold N/11
    val items = (1 to 100).flatMap(i => Seq.fill(2000 / i)(s"it$i"))
    val df = scala.util.Random.shuffle(items).toDF("v").repartition(13)
    val n = items.size.toDouble
    val expected = items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 11 > n }.toMap
    val got = HeavyHitters(df, $"v", capacity = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("output is count-descending, ties by item") {
    val df = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(9)("c"))
      .toDF("v")
    val rows = HeavyHitters(df, $"v", capacity = 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("c", 9L), ("a", 5L), ("b", 5L)))
  }

  test("empty input and all-null column yield empty, schema intact") {
    val empty = HeavyHitters(Seq.empty[String].toDF("v"), $"v", 4)
    assert(empty.columns.toSeq === Seq("item", "cnt"))
    assert(empty.count() === 0)
    val nulls = HeavyHitters(Seq(Option.empty[String]).toDF("v"), $"v", 4)
    assert(nulls.count() === 0)
  }

  test("uniform stream above threshold: everything qualifies") {
    // 4 items × 25 each, capacity 9 → threshold 100/10 = 10 < 25
    val df = (1 to 4).flatMap(i => Seq.fill(25)(s"u$i")).toDF("v")
    val got = HeavyHitters(df, $"v", capacity = 9)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === (1 to 4).map(i => s"u$i" -> 25L).toMap)
  }
}
