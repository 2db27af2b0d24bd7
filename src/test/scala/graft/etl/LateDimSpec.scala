package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Late-arriving dimension: inferred members key facts immediately,
  * late SCD1 arrivals correct attributes in place with stable
  * surrogates, and re-running ensureMembers is a no-op. */
class LateDimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dim0 = Seq(
    (1L, "AUTO"), (2L, "BIKE"), (4L, "SHIP"))
    .toDF("k", "seg")
  private lazy val facts = Seq(
    (1L, 10.0), (2L, 20.0), (3L, 30.0), (5L, 50.0), (3L, 31.0))
    .toDF("k", "amount")

  private lazy val t1 = LateDim.init(dim0, Seq("k"), "sk")
  private lazy val d1 = LateDim.ensureMembers(t1, facts, Seq("k"), "sk",
    Map("seg" -> lit("UNKNOWN")))

  test("init assigns dense ids and marks members real") {
    val rows = t1.orderBy("k").collect()
    assert(rows.map(_.getAs[Long]("sk")).toSeq === Seq(1L, 2L, 3L))
    assert(rows.forall(!_.getAs[Boolean]("inferred")))
  }

  test("ensureMembers adds exactly the unseen fact keys, above max id") {
    val inferred = d1.filter(col("inferred")).orderBy("k").collect()
    assert(inferred.map(_.getAs[Long]("k")).toSeq === Seq(3L, 5L))
    assert(inferred.forall(_.getAs[String]("seg") == "UNKNOWN"))
    // ids continue above the existing max, existing ids untouched
    assert(inferred.map(_.getAs[Long]("sk")).toSeq === Seq(4L, 5L))
    val realIds = d1.filter(!col("inferred")).orderBy("k").collect()
      .map(_.getAs[Long]("sk")).toSeq
    assert(realIds === Seq(1L, 2L, 3L))
    // idempotent: same facts again add nothing
    val again = LateDim.ensureMembers(d1, facts, Seq("k"), "sk",
      Map("seg" -> lit("UNKNOWN")))
    assert(again.count() === d1.count())
  }

  test("scd1Arrive overwrites in place with stable surrogates; new keys append") {
    val arrivals = Seq((3L, "RAIL"), (9L, "PLANE")).toDF("k", "seg")
    val d2 = LateDim.scd1Arrive(d1, arrivals, Seq("k"), "sk", Seq("seg"))
    val byKey = d2.collect().map(r =>
      r.getAs[Long]("k") -> ((r.getAs[Long]("sk"), r.getAs[String]("seg"),
        r.getAs[Boolean]("inferred")))).toMap
    // updated member: same surrogate as in d1, real attrs, flag cleared
    val skBefore = d1.filter(col("k") === 3L).head().getAs[Long]("sk")
    assert(byKey(3L) === ((skBefore, "RAIL", false)))
    // untouched inferred member keeps its placeholder
    assert(byKey(5L)._2 === "UNKNOWN" && byKey(5L)._3)
    // genuinely new key appended as a real member above max
    assert(byKey(9L)._2 === "PLANE" && !byKey(9L)._3)
    assert(byKey(9L)._1 > d1.agg(max(col("sk"))).head().getLong(0) - 1)
    assert(d2.count() === d1.count() + 1)
  }

  test("facts keyed before the late arrival resolve corrected attributes") {
    val keyed = SurrogateKeys.resolve(facts, d1, Seq("k"), "sk")
      .select(col("sk"), col("amount"))
    val arrivals = Seq((3L, "RAIL")).toDF("k", "seg")
    val d2 = LateDim.scd1Arrive(d1, arrivals, Seq("k"), "sk", Seq("seg"))
    val got = keyed.join(d2.select(col("sk"), col("seg")), Seq("sk"))
      .groupBy("seg").agg(sum(col("amount")).as("amt"))
      .orderBy("seg").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // k=3 facts (30+31) now read RAIL; k=5 still UNKNOWN
    assert(got === Seq(("AUTO", 10.0), ("BIKE", 20.0), ("RAIL", 61.0),
      ("UNKNOWN", 50.0)))
  }

  test("a delivery carrying the same key twice never fans the dim out") {
    val arrivals = Seq((3L, "RAIL"), (3L, "RAIL"), (9L, "PLANE"),
      (9L, "PLANE")).toDF("k", "seg")
    val d2 = LateDim.scd1Arrive(d1, arrivals, Seq("k"), "sk", Seq("seg"))
    // one row per key — before the dedup fix the LEFT join duplicated
    // the k=3 member once per matching arrival row
    assert(d2.groupBy("k").count().filter(col("count") > 1).count() === 0)
    assert(d2.count() === d1.count() + 1)
    // surrogate keys still unique
    assert(d2.select("sk").distinct().count() === d2.count())
  }

  test("null natural key is a value: gets one member, matches arrivals null-safely") {
    val dimN = Seq((Some(1L), "AUTO")).toDF("k", "seg")
    val factsN = Seq((Option.empty[Long], 5.0), (Some(1L), 1.0))
      .toDF("k", "amount")
    val t = LateDim.init(dimN, Seq("k"), "sk")
    val d = LateDim.ensureMembers(t, factsN, Seq("k"), "sk",
      Map("seg" -> lit("UNKNOWN")))
    assert(d.count() === 2)
    val d2 = LateDim.ensureMembers(d, factsN, Seq("k"), "sk",
      Map("seg" -> lit("UNKNOWN")))
    assert(d2.count() === 2, "null key must not re-append on reload")
    val arr = Seq((Option.empty[Long], "VOID")).toDF("k", "seg")
    val d3 = LateDim.scd1Arrive(d2, arr, Seq("k"), "sk", Seq("seg"))
    val nullRow = d3.filter(col("k").isNull).head()
    assert(nullRow.getAs[String]("seg") === "VOID")
    assert(!nullRow.getAs[Boolean]("inferred"))
  }
}
