package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def results(df: org.apache.spark.sql.DataFrame,
      rules: Seq[Quality.Rule]): Map[String, (Long, Boolean)] =
    Quality.check(df, rules).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

  test("fused row-level rules count violations independently") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "O", 10.0), (2L, "X", -3.0), (null, "O", 2000.0), (4L, null, null))
      .toDF("k", "st", "price")
    val out = results(df, Seq(
      Quality.NotNull("k"),
      Quality.Accepted("st", Seq("O", "F")),
      Quality.InRange("price", 0, 1000)))
    assert(out("not_null(k)") === ((1L, false)))
    // null st passes Accepted (NotNull's job)
    assert(out("accepted_values(st)") === ((1L, false)))
    // -3 and 2000 out of range; null price exempt
    assert(out("in_range(price)") === ((2L, false)))
  }

  test("unique counts surplus rows; null key components exempt") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 1L), (1L, 1L), (1L, 1L), (2L, 1L), (null, 1L), (null, 1L))
      .toDF("a", "b")
    val out = results(df, Seq(Quality.Unique(Seq("a", "b"))))
    assert(out("unique(a,b)") === ((2L, false))) // three (1,1) rows → 2 extra
  }

  test("refers_to counts dangling non-null FKs") {
    val facts = Seq[java.lang.Long](1L, 2L, 9L, 9L, null).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("id")
    val out = results(facts, Seq(Quality.RefersTo("fk", dim, "id")))
    assert(out("refers_to(fk)") === ((2L, false)))
  }

  test("two same-kind rules on one column keep independent counts") {
    // same check label ("in_range(x)" twice) — results must be keyed
    // by rule position, not label, or one fence overwrites the other
    val df = Seq(1.0, 5.0, 50.0, 500.0).toDF("x")
    val out = Quality.check(df, Seq(
        Quality.InRange("x", 0, 100),    // 500 violates → 1
        Quality.InRange("x", 0, 10),     // 50, 500 violate → 2
        Quality.InRange("x", 2, 1000))   // 1 violates → 1
      ).collect().map(r => (r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq === Seq((1L, false), (2L, false), (1L, false)))
  }

  test("clean table passes everything; empty table passes too") {
    val clean = Seq((1L, "O"), (2L, "F")).toDF("k", "st")
    val rules = Seq(Quality.NotNull("k"), Quality.Unique(Seq("k")),
      Quality.Accepted("st", Seq("O", "F")))
    assert(results(clean, rules).values.forall(_ == ((0L, true))))
    val empty = clean.filter($"k" < 0)
    assert(results(empty, rules).values.forall(_ == ((0L, true))))
  }
}
