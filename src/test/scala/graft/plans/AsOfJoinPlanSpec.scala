package graft.plans

import graft.TestSpark
import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinPlanSpec extends AnyFunSuite {
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

  private def canon(df: DataFrame) =
    df.orderBy(df.columns.map(col): _*).collect().map(_.toSeq).toSeq

  test("native node routes through AsOfJoinExec, not union+window") {
    val out = AsOfJoin.asOfNative(left, right, "k", "t", Seq("rid", "v"), "rid")
    val phys = out.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin")) // nodeName strips the Exec suffix
    assert(!phys.contains("Window"))
  }

  test("parity with the window formulation on the base fixture") {
    val a = AsOfJoin.asOf(left, right, "k", "t", Seq("rid", "v"), "rid")
    val b = AsOfJoin.asOfNative(left, right, "k", "t", Seq("rid", "v"), "rid")
    assert(a.columns.toSeq === b.columns.toSeq)
    assert(canon(a) === canon(b))
  }

  test("parity: simultaneous right rows resolved by tiebreak") {
    val l = Seq((1L, 11L, "x")).toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 7L, 7.0), (1L, 10L, 9L, 9.0), (1L, 10L, 8L, 8.0))
      .toDF("k", "t", "rid", "v")
    val out = AsOfJoin.asOfNative(l, r, "k", "t", Seq("rid"), "rid").collect()
    assert(out.head.getAs[Long]("rid") === 9L)
  }

  test("parity: NULL keys routed around the merge on both sides") {
    val l = Seq((Some(1L), 20L, "a"), (Option.empty[Long], 20L, "b"))
      .toDF("k", "t", "tag")
    val r = Seq((Some(1L), 10L, 100L), (Option.empty[Long], 10L, 999L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.asOfNative(l, r, "k", "t", Seq("rid"), "rid")
      .collect().map(x => (x.getAs[String]("tag"), Option(x.getAs[Any]("rid")))).toMap
    assert(out === Map("a" -> Some(100L), "b" -> None))
  }

  test("parity: matched row's NULL carry attribute survives atomically") {
    val l = Seq((1L, 30L, "x")).toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 7L, Some(2.0)), (1L, 20L, 9L, Option.empty[Double]))
      .toDF("k", "t", "rid", "v")
    val out = AsOfJoin.asOfNative(l, r, "k", "t", Seq("rid", "v"), "rid")
      .collect().head
    assert(out.getAs[Long]("rid") === 9L)
    assert(out.isNullAt(out.fieldIndex("v")))
  }

  test("self-join (same base relation both sides) analyzes and matches") {
    val ev = Seq((1L, 10L, "view"), (1L, 15L, "click"), (1L, 20L, "view"))
      .toDF("u", "t", "et")
    val l = ev.filter($"et" === "click").select($"u", $"t", $"et".as("tag"))
    val r = ev.filter($"et" === "view")
      .select($"u", $"t", $"t".as("view_t"))
    val a = AsOfJoin.asOf(l, r, "u", "t", Seq("view_t"), "view_t")
    val b = AsOfJoin.asOfNative(l, r, "u", "t", Seq("view_t"), "view_t")
    assert(canon(a) === canon(b))
    assert(b.collect().head.getAs[Long]("view_t") === 10L)
  }

  test("randomized parity across many keys, ties, and partitions") {
    val rnd = new scala.util.Random(42)
    val l = Seq.tabulate(400)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, s"l$i"))
      .toDF("k", "t", "tag").repartition(7)
    val r = Seq.tabulate(300)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, i.toLong, rnd.nextDouble()))
      .toDF("k", "t", "rid", "v").repartition(5)
    val a = AsOfJoin.asOf(l, r, "k", "t", Seq("rid", "v"), "rid")
    val b = AsOfJoin.asOfNative(l, r, "k", "t", Seq("rid", "v"), "rid")
    assert(canon(a) === canon(b))
  }

  test("result feeds a downstream aggregation (UnsafeRow contract)") {
    val out = AsOfJoin.asOfNative(left, right, "k", "t", Seq("v"), "rid")
      .groupBy($"k").agg(sum($"v").as("sv"))
      .orderBy($"k").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any]("sv")))
    assert(out.toSeq === Seq(
      1L -> Some(4.0), // 1.0 + 1.0 + 2.0
      2L -> Some(3.0),
      3L -> None))
  }

  test("forward parity with the window formulation on the base fixture") {
    val a = AsOfJoin.asOf(left, right, "k", "t", Seq("rid", "v"), "rid",
      forward = true)
    val b = AsOfJoin.asOfNative(left, right, "k", "t", Seq("rid", "v"),
      "rid", forward = true)
    assert(a.columns.toSeq === b.columns.toSeq)
    assert(canon(a) === canon(b))
    // and the values are the forward semantics, not backward's
    val got = b.collect()
      .map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("rid")))).toMap
    assert(got === Map("l1" -> Some(100L), "l2" -> Some(101L),
      "l3" -> None, "l4" -> Some(103L), "l5" -> None))
  }

  test("forward: equal-timestamp run resolved to max tiebreak, same as backward") {
    val l = Seq((1L, 9L, "x")).toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 10L, 8L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin.asOfNative(l, r, "k", "t", Seq("rid"), "rid",
      forward = true).collect()
    assert(out.head.getAs[Long]("rid") === 9L)
  }

  test("randomized forward parity across many keys, ties, and partitions") {
    val rnd = new scala.util.Random(43)
    val l = Seq.tabulate(400)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, s"l$i"))
      .toDF("k", "t", "tag").repartition(7)
    val r = Seq.tabulate(300)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50).toLong, i.toLong, rnd.nextDouble()))
      .toDF("k", "t", "rid", "v").repartition(5)
    val a = AsOfJoin.asOf(l, r, "k", "t", Seq("rid", "v"), "rid",
      forward = true)
    val b = AsOfJoin.asOfNative(l, r, "k", "t", Seq("rid", "v"), "rid",
      forward = true)
    assert(canon(a) === canon(b))
  }

  test("tolerance parity: native post-projection equals the window face") {
    for (fwd <- Seq(false, true); tol <- Seq(4.0, 5.0, 20.0)) {
      val a = AsOfJoin.asOf(left, right, "k", "t", Seq("rid", "v"), "rid",
        forward = fwd, toleranceSec = Some(tol))
      val b = AsOfJoin.asOfNative(left, right, "k", "t", Seq("rid", "v"),
        "rid", forward = fwd, toleranceSec = Some(tol))
      assert(a.columns.toSeq === b.columns.toSeq, s"fwd=$fwd tol=$tol")
      assert(canon(a) === canon(b), s"fwd=$fwd tol=$tol")
    }
    // spot value: backward tol=5 keeps only matches within 5 ticks
    val out = AsOfJoin.asOfNative(left, right, "k", "t", Seq("rid"), "rid",
      toleranceSec = Some(5.0))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("rid")))).toMap
    assert(out === Map("l1" -> Some(100L), "l2" -> None, "l3" -> Some(101L),
      "l4" -> Some(102L), "l5" -> None))
  }

  test("physical plan: one exchange per side, merge preserves left clustering") {
    val out = AsOfJoin.asOfNative(left, right, "k", "t", Seq("v"), "rid")
    // AdaptiveSparkPlanExec is a leaf to collect(); assert on the plan
    // string: exactly the two ENSURE_REQUIREMENTS hash exchanges the
    // ClusteredDistribution requirements demand, nothing more
    val phys = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(phys).length
    assert(exchanges === 2, phys)
  }
}
