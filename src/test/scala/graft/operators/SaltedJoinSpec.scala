package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join result equals the plain join (inner)") {
    val orders = TestSpark.table("orders")
    val customer = TestSpark.table("customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SaltedJoin.join(orders,
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey"), buckets = 7)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("left join keeps unmatched big-side rows exactly once") {
    import spark.implicits._
    val big = Seq((1, "a"), (1, "b"), (2, "c"), (99, "zz")).toDF("k", "v")
    val small = Seq((1, "x"), (2, "y")).toDF("k", "w")
    val out = SaltedJoin.join(big, small, Seq("k"), buckets = 4, "left")
      .collect().map(r => (r.getInt(0), r.getString(1), Option(r.getString(2))))
    assert(out.length === 4)
    assert(out.toSet === Set((1, "a", Some("x")), (1, "b", Some("x")),
      (2, "c", Some("y")), (99, "zz", None)))
  }
}
