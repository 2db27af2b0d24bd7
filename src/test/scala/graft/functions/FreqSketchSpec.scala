package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (item, est) pairs from a freq_sketch over one string column. */
  private def sketch(items: Seq[String], capacity: Int,
      partitions: Int = 8): Map[String, Long] =
    items.toDF("v").repartition(partitions)
      .agg(freq_sketch($"v", capacity).as("sk"))
      .select(explode($"sk")).select("col.item", "col.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("small input, large capacity: exact counts") {
    val items = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    assert(sketch(items, capacity = 16) === Map("a" -> 7L, "b" -> 3L, "c" -> 1L))
  }

  test("MG guarantee: every item above N/(capacity+1) survives, " +
      "est is a lower bound within N/(capacity+1), on every layout") {
    // Zipf-ish stream: item i appears 500/i times, i in 1..50
    val items = (1 to 50).flatMap(i => Seq.fill(500 / i)(s"it$i"))
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size
    for (capacity <- Seq(5, 20); partitions <- Seq(1, 7, 32)) {
      val sk = sketch(scala.util.Random.shuffle(items), capacity, partitions)
      val bound = n.toDouble / (capacity + 1)
      assert(sk.size <= capacity)
      truth.foreach { case (item, cnt) =>
        if (cnt > bound)
          assert(sk.contains(item),
            s"cap=$capacity parts=$partitions lost heavy item $item ($cnt > $bound)")
      }
      sk.foreach { case (item, est) =>
        val cnt = truth(item)
        assert(est <= cnt, s"over-estimate for $item: $est > $cnt")
        assert(est >= cnt - bound - 1e-9,
          s"cap=$capacity parts=$partitions est too low for $item: $est < $cnt - $bound")
      }
    }
  }

  test("nulls are ignored") {
    val sk = Seq(Some("a"), None, Some("a"), None).toDF("v")
      .agg(freq_sketch($"v", 4).as("sk"))
      .select(explode($"sk")).select("col.item", "col.est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk === Map("a" -> 2L))
  }

  test("empty input yields an empty sketch") {
    val sk = Seq.empty[String].toDF("v").agg(freq_sketch($"v", 4)).head()
    assert(sk.getSeq[Any](0).isEmpty)
  }

  test("long keys and per-group aggregation") {
    // 3 groups, each with its own hot key
    val df = (0 until 300).map(i => (i % 3, if (i % 5 == 0) 999L else i.toLong))
      .toDF("g", "v")
    val out = df.groupBy($"g")
      .agg(freq_sketch($"v", 8).as("sk"))
      .select($"g", explode($"sk")).select("g", "col.item", "col.est")
      .collect()
    // 999 appears 20 times per group of 100 rows — always above 100/9
    val hot = out.filter(_.getLong(1) == 999L)
    assert(hot.length === 3)
  }

  test("rejects non-hashable input types at analysis time") {
    val err = intercept[Exception] {
      Seq(Seq(1, 2)).toDF("v").agg(freq_sketch($"v", 4)).head()
    }
    assert(err.getMessage.toLowerCase.contains("hashable") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
