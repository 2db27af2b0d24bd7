package graft.privacy

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AnonymitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 5-row QI landscape: ("a",1) class of 3, ("b",1) class of 1,
  // (null,2) class of 1 — NULL QI forms its own class
  private lazy val df = Seq[(String, java.lang.Integer, String)](
    ("a", 1, "s1"), ("a", 1, "s1"), ("a", 1, "s2"),
    ("b", 1, "s3"), (null, 2, "s3"))
    .toDF("seg", "grp", "secret")

  test("audit counts sub-k classes, rows at risk, and min diversity") {
    val r = Anonymity.audit(df, Seq("seg", "grp"), "secret", k = 2)
      .collect()(0)
    assert(r.getAs[Long]("n_rows") === 5L)
    assert(r.getAs[Long]("n_classes") === 3L)
    assert(r.getAs[Long]("k_anonymity") === 1L)   // the two singletons
    assert(r.getAs[Long]("classes_below_k") === 2L)
    assert(r.getAs[Long]("rows_at_risk") === 2L)
    assert(r.getAs[Double]("risk_frac") === 0.4)
    assert(r.getAs[Long]("min_l_diversity") === 1L)
  }

  test("a k-anonymous release reports zero risk") {
    val r = Anonymity.audit(df, Seq("grp"), "secret", k = 1).collect()(0)
    assert(r.getAs[Long]("classes_below_k") === 0L)
    assert(r.getAs[Long]("rows_at_risk") === 0L)
    assert(r.getAs[Double]("risk_frac") === 0.0)
  }

  test("equivalenceClasses keeps NULL QI as a class of its own") {
    val ec = Anonymity.equivalenceClasses(df, Seq("seg"), "secret")
      .collect().map(r => Option(r.getString(0)) -> r.getAs[Long]("class_size"))
      .toMap
    assert(ec(Some("a")) === 3L)
    assert(ec(None) === 1L)
  }
}
