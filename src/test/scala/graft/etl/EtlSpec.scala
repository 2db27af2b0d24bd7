package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SurrogateKeysSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dim assigns dense 1..N ids in natural-key order") {
    val df = Seq(("b", 2), ("a", 1), ("b", 2), ("a", 2), ("c", 1))
      .toDF("k1", "k2")
    val dim = SurrogateKeys.dim(df, Seq("k1", "k2"), "id")
      .orderBy("id").collect()
    assert(dim.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq ===
      Seq(("a", 1, 1L), ("a", 2, 2L), ("b", 2, 3L), ("c", 1, 4L)))
  }

  test("dim is deterministic under different input partitioning") {
    val li = TestSpark.table("lineitem")
    val d1 = SurrogateKeys.dim(li, Seq("l_returnflag", "l_linestatus"), "id")
    val d2 = SurrogateKeys.dim(li.repartition(13, $"l_orderkey"),
      Seq("l_returnflag", "l_linestatus"), "id")
    assert(d1.orderBy("id").collect().toSeq === d2.orderBy("id").collect().toSeq)
  }

  test("dimAppend keeps existing ids and appends above max") {
    val first = SurrogateKeys.dim(Seq("a", "b").toDF("k"), Seq("k"), "id")
    val appended = SurrogateKeys.dimAppend(first,
      Seq("b", "c", "d").toDF("k"), Seq("k"), "id")
    val m = appended.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") === 1L && m("b") === 2L)
    assert(Set(m("c"), m("d")) === Set(3L, 4L))
    assert(appended.count() === 4)
  }

  test("resolve broadcast-joins facts to dim keys") {
    val li = TestSpark.table("lineitem")
    val dim = SurrogateKeys.dim(li, Seq("l_returnflag"), "id_rf")
    val resolved = SurrogateKeys.resolve(li, dim, Seq("l_returnflag"), "id_rf")
    assert(resolved.filter($"id_rf".isNull).count() === 0)
    assert(resolved.count() === li.count())
    val plan = resolved.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dim join must broadcast")
  }
}

class RouterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("split routes null-predicate rows to the false branch") {
    val df = Seq(Some("entrada"), Some("salida"), None).toDF("tip")
    val (t, f) = Router.split(df, $"tip" === "entrada")
    assert(t.count() === 1)
    assert(f.count() === 2) // salida AND null — PDI semantics
  }

  test("split partitions: branches are disjoint and exhaustive") {
    val orders = TestSpark.table("orders")
    val (t, f) = Router.split(orders, $"o_orderstatus" === "O")
    assert(t.count() + f.count() === orders.count())
  }

  test("tag matches split") {
    val orders = TestSpark.table("orders")
    val tagged = Router.tag(orders, $"o_orderstatus" === "O", "in", "out")
    val (t, _) = Router.split(orders, $"o_orderstatus" === "O")
    assert(tagged.filter($"route" === "in").count() === t.count())
  }
}

class CleaningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("valueMap maps known values and passes through unknown") {
    val df = Seq("enero", "febrero", "marte", "diciembre").toDF("m")
    val out = df.select(Cleaning.valueMap($"m", Cleaning.spanishMonths).as("v"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("1", "2", "marte", "12"))
  }

  test("sentinelToNull nulls exactly the sentinel") {
    val df = Seq("25", "sin especificar", "30").toDF("edad")
    val out = df.select(Cleaning.sentinelToNull($"edad", "sin especificar")
      .cast("int").as("v")).collect()
    assert(out(0).getInt(0) === 25)
    assert(out(1).isNullAt(0))
    assert(out(2).getInt(0) === 30)
  }

  test("concatDate formats yyyy/M/d without padding") {
    val df = Seq((2023, 4, 7)).toDF("a", "m", "d")
    val out = df.select(Cleaning.concatDate($"a", $"m", $"d")).head.getString(0)
    assert(out === "2023/4/7")
  }

  test("classify uses normalized compare; unmappedValues side channel") {
    val dict = Map("ingeniero" -> "Profesionales")
    val df = Seq("  INGENIERO ", "panadero", "Ingeniero").toDF("ocu")
    val out = df.select(Cleaning.classify($"ocu", dict).as("c"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("Profesionales", "panadero", "Profesionales"))
    val unmapped = Cleaning.unmappedValues(df, "ocu", dict)
      .collect().map(_.getString(0))
    assert(unmapped.toSeq === Seq("panadero"))
  }
}
