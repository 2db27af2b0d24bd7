package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DiscoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("true FK scores containment 1.0; orphans lower it") {
    val child = Seq[java.lang.Long](1L, 1L, 2L, 9L, null).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("id")
    val r = Discovery.inclusion("t", child, "fk", parent, "id").collect()(0)
    assert(r.getAs[Long]("n_child_distinct") === 3L) // 1, 2, 9
    assert(r.getAs[Long]("n_missing") === 1L)        // 9
    assert(math.abs(r.getAs[Double]("containment") - 0.666667) < 1e-9)
    assert(r.getAs[Long]("n_null_child") === 1L)
  }

  test("discover unions pairs ordered by label") {
    val a = Seq(1L).toDF("x"); val b = Seq(1L, 2L).toDF("y")
    val out = Discovery.discover(Seq(
      ("z_pair", a, "x", b, "y"), ("a_pair", b, "y", a, "x"))).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a_pair", "z_pair"))
    assert(out(0).getAs[Double]("containment") === 0.5) // {1,2} vs {1}
    assert(out(1).getAs[Double]("containment") === 1.0)
  }

  test("empty child yields NULL containment, not 1.0") {
    val child = Seq.empty[Long].toDF("fk")
    val parent = Seq(1L).toDF("id")
    val r = Discovery.inclusion("e", child, "fk", parent, "id").collect()(0)
    assert(r.isNullAt(r.fieldIndex("containment")))
  }

  test("on the star schema: real FKs 1.0, nation->region partial") {
    val out = Discovery.discover(Seq(
      ("li->ord", TestSpark.table("lineitem"), "l_orderkey",
        TestSpark.table("orders"), "o_orderkey"),
      ("nat->reg", TestSpark.table("customer"), "c_nationkey",
        TestSpark.table("region"), "r_regionkey")))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("containment"))
      .toMap
    assert(out("li->ord") === 1.0)
    assert(out("nat->reg") < 1.0) // 25 nations, 5 regions
  }
}
