package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 30L, "l3"),
    (2L, 15L, "l4"), (3L, 5L, "l5")
  ).toDF("k", "t", "tag")

  private def right = Seq(
    (1L, 10L, 100L, 1.0), (1L, 25L, 101L, 2.0),
    (2L, 10L, 102L, 3.0), (2L, 16L, 103L, 4.0)
  ).toDF("k", "t", "rid", "v")

  test("picks latest right row at-or-before each left timestamp, per key") {
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("rid", "v"), "rid")
      .orderBy("k", "t").collect()
      .map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("rid"))))
    assert(out.toSeq === Seq(
      ("l1", Some(100L)), // equal timestamp is inclusive
      ("l2", Some(100L)), // 25 is after 20 → still 100
      ("l3", Some(101L)),
      ("l4", Some(102L)), // 16 is after 15 → 102, not 103
      ("l5", None)))      // no right row before → null (left join)
  }

  test("simultaneous right rows: the one ranking last under the tiebreak wins") {
    val dupRight = Seq((1L, 10L, 7L, 7.0), (1L, 10L, 9L, 9.0), (1L, 10L, 8L, 8.0))
      .toDF("k", "t", "rid", "v")
    val out = AsOfJoin.asOf(Seq((1L, 11L, "x")).toDF("k", "t", "tag"),
      dupRight, "k", "t", Seq("rid"), "rid").collect()
    assert(out.head.getAs[Long]("rid") === 9L)
  }

  test("matched row with a NULL carry value is NOT patched from older rows") {
    // right at t=10 has v=2.0; right at t=20 has v=NULL; left at t=30
    // must see (rid=9, v=NULL) — the matched row atomically — not a
    // frankenrow (rid=9, v=2.0)
    val l = Seq((1L, 30L, "x")).toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 7L, Some(2.0)), (1L, 20L, 9L, Option.empty[Double]))
      .toDF("k", "t", "rid", "v")
    val out = AsOfJoin.asOf(l, r, "k", "t", Seq("rid", "v"), "rid").collect().head
    assert(out.getAs[Long]("rid") === 9L)
    assert(out.isNullAt(out.fieldIndex("v")),
      "NULL attribute of the matched row must survive")
  }

  test("left columns pass through unchanged") {
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("v"), "rid")
    assert(out.columns.toSeq === Seq("k", "t", "tag", "v"))
    assert(out.count() === 5)
  }

  test("NULL-keyed left rows pass through with a null carry, never matching NULL-keyed right rows") {
    val l = Seq((Some(1L), 20L, "a"), (Option.empty[Long], 20L, "b"))
      .toDF("k", "t", "tag")
    val r = Seq((Some(1L), 10L, 100L), (Option.empty[Long], 10L, 999L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.asOf(l, r, "k", "t", Seq("rid"), "rid")
      .collect().map(x => (x.getAs[String]("tag"), Option(x.getAs[Any]("rid")))).toMap
    assert(out === Map("a" -> Some(100L), "b" -> None))
  }

  test("reserved internal column names are rejected, not silently clobbered") {
    val bad = Seq((1L, 10L, "x")).toDF("k", "__ts", "tag")
    val r = Seq((1L, 5L, 9L)).toDF("k", "t", "rid")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(bad, r, "k", "__ts", Seq("rid"), "rid")
    }
    assert(e.getMessage.contains("__ts"))
  }

  test("matches DuckDB-style semantics on the events table shape") {
    // self-contained mini replay of q41: clicks get last error per user
    // one shared loader; integer (epoch-micros) time axis for exact math
    val ev = graft.Tables.eventsEpochMicros(spark, TestSpark.sf)
    val clicks = ev.filter($"event_type" === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id".as("err_id"))
    val joined = AsOfJoin.asOf(clicks, errors, "user_id", "ts", Seq("err_id"), "err_id")
    assert(joined.count() === clicks.count()) // left join: row-preserving
    // spot-check one user against a window-free reference computation
    val u = clicks.select($"user_id").limit(1).collect().head.getLong(0)
    val uClicks = clicks.filter($"user_id" === u).collect()
    val uErrors = errors.filter($"user_id" === u)
      .collect().map(r => (r.getAs[Long]("ts"), r.getAs[Long]("err_id")))
    val got = joined.filter($"user_id" === u).collect()
      .map(r => r.getAs[Long]("ts") -> Option(r.getAs[Any]("err_id"))).toMap
    uClicks.foreach { c =>
      val ct = c.getAs[Long]("ts")
      val expect = uErrors.filter(_._1 <= ct).sortBy(identity).lastOption.map(_._2)
      assert(got(ct) === expect, s"user $u click at $ct")
    }
  }

  test("forward: picks EARLIEST right row at-or-after, inclusive, null past the end") {
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"), "rid",
      forward = true)
      .orderBy("k", "t").collect()
      .map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("rid"))))
    assert(out.toSeq === Seq(
      ("l1", Some(100L)), // equal timestamp inclusive, same as backward
      ("l2", Some(101L)), // next right row after t=20 is t=25
      ("l3", None),       // nothing after t=30
      ("l4", Some(103L)), // t=16 is the first at-or-after 15
      ("l5", None)))
  }

  test("forward tie-break: same winner rule as backward (max tiebreak wins)") {
    val dupRight = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 10L, 8L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.asOf(Seq((1L, 9L, "x")).toDF("k", "t", "tag"),
      dupRight, "k", "t", Seq("rid"), "rid", forward = true).collect()
    assert(out.head.getAs[Long]("rid") === 9L)
  }

  test("tolerance: a match farther than the bound is nulled; the boundary is inclusive") {
    val l = Seq((1L, 30L, "x")).toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 7L)).toDF("k", "t", "rid")
    def rid(tol: Double) = {
      val row = AsOfJoin.asOf(l, r, "k", "t", Seq("rid"), "rid",
        toleranceSec = Some(tol)).collect().head
      Option(row.getAs[Any]("rid"))
    }
    assert(rid(19.0) === None)      // distance 20 > 19 → rejected
    assert(rid(20.0) === Some(7L))  // exactly at the bound → kept
  }

  test("tolerance composes with forward; rejected match equals no-match row shape") {
    val l = Seq((1L, 20L, "x"), (1L, 100L, "y")).toDF("k", "t", "tag")
    val r = Seq((1L, 25L, 7L)).toDF("k", "t", "rid")
    val out = AsOfJoin.asOf(l, r, "k", "t", Seq("rid"), "rid",
      forward = true, toleranceSec = Some(4.0))
      .collect().map(x => (x.getAs[String]("tag"), Option(x.getAs[Any]("rid")))).toMap
    assert(out === Map("x" -> None, "y" -> None)) // 5 > 4 rejected; no candidate at all
    val kept = AsOfJoin.asOf(l, r, "k", "t", Seq("rid"), "rid",
      forward = true, toleranceSec = Some(5.0))
      .collect().map(x => (x.getAs[String]("tag"), Option(x.getAs[Any]("rid")))).toMap
    assert(kept === Map("x" -> Some(7L), "y" -> None))
  }

  test("tolerance on a DATE time axis: epoch-days arithmetic, no cast crash") {
    val l = Seq((1L, java.sql.Date.valueOf("2024-01-10"), "x"))
      .toDF("k", "d", "tag")
    val r = Seq((1L, java.sql.Date.valueOf("2024-01-03"), 7L))
      .toDF("k", "d", "rid")
    def rid(tolSec: Double) = {
      val row = AsOfJoin.asOf(l, r, "k", "d", Seq("rid"), "rid",
        toleranceSec = Some(tolSec)).collect().head
      Option(row.getAs[Any]("rid"))
    }
    assert(rid(7 * 86400.0) === Some(7L)) // 7 days apart, inclusive
    assert(rid(6 * 86400.0) === None)
  }

  test("forward matches a brute-force reference on the events table shape") {
    val ev = graft.Tables.eventsEpochMicros(spark, TestSpark.sf)
    val clicks = ev.filter($"event_type" === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id".as("err_id"))
    val joined = AsOfJoin.asOf(clicks, errors, "user_id", "ts",
      Seq("err_id"), "err_id", forward = true)
    assert(joined.count() === clicks.count())
    val u = clicks.select($"user_id").limit(1).collect().head.getLong(0)
    val uErrors = errors.filter($"user_id" === u)
      .collect().map(r => (r.getAs[Long]("ts"), r.getAs[Long]("err_id")))
    val got = joined.filter($"user_id" === u).collect()
      .map(r => r.getAs[Long]("ts") -> Option(r.getAs[Any]("err_id"))).toMap
    clicks.filter($"user_id" === u).collect().foreach { c =>
      val ct = c.getAs[Long]("ts")
      val expect = uErrors.filter(_._1 >= ct).sortBy(identity).headOption.map(_._2)
      assert(got(ct) === expect, s"user $u click at $ct (forward)")
    }
  }
}
