package graft.operators

import scala.util.Random

import graft.TestSpark
import graft.functions.might_contain_bloom
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives: every inserted long and string probes true") {
    val df = (1L to 2000L).map(i => (i, s"key-$i")).toDF("k", "s")
    val bLong = BloomJoin.bloomOf(df, "k", 2000L)
    val bStr = BloomJoin.bloomOf(df, "s", 2000L)
    val misses = df
      .filter(!might_contain_bloom($"k", bLong) ||
        !might_contain_bloom($"s", bStr))
      .count()
    assert(misses === 0L)
  }

  test("probe expression rejects most absent keys (fpp-bounded)") {
    val present = (1L to 1000L).toDF("k")
    val bloom = BloomJoin.bloomOf(present, "k", 1000L, fpp = 0.01)
    val absent = (100001L to 110000L).toDF("k")
    val falsePositives =
      absent.filter(might_contain_bloom($"k", bloom)).count()
    assert(falsePositives < 500L, s"fpp blew up: $falsePositives/10000")
  }

  test("semiJoin is exact vs the plain semi join") {
    val rnd = new Random(11)
    val big = Seq.fill(3000)((rnd.nextInt(500).toLong, rnd.nextInt())).toDF("k", "v")
    val small = Seq.fill(60)(rnd.nextInt(500).toLong).toDF("sk")
    val got = BloomJoin.semiJoin(big, "k", small, "sk", 60L)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = big.join(small, big("k") === small("sk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got === want)
  }

  test("antiJoin is exact vs the plain anti join, null keys kept") {
    val rnd = new Random(13)
    val bigRows = Seq.fill(3000)(
      (if (rnd.nextInt(50) == 0) null else java.lang.Long.valueOf(rnd.nextInt(500).toLong),
        rnd.nextInt()))
    val big = bigRows.toDF("k", "v")
    val small = Seq.fill(60)(rnd.nextInt(500).toLong).toDF("sk")
    val got = BloomJoin.antiJoin(big, "k", small, "sk", 60L)
      .collect().map(r => (Option(r.get(0)), r.getInt(1))).toSeq.sorted(
        Ordering.by((t: (Option[Any], Int)) => (t._1.map(_.toString), t._2)))
    val want = big.join(small, big("k") === small("sk"), "left_anti")
      .collect().map(r => (Option(r.get(0)), r.getInt(1))).toSeq.sorted(
        Ordering.by((t: (Option[Any], Int)) => (t._1.map(_.toString), t._2)))
    assert(got === want)
  }

  test("string keys: semi join exact with UTF-8 content") {
    val big = Seq("añejo", "straße", "plain", "キー", "absent")
      .zipWithIndex.map { case (s, i) => (s, i) }.toDF("k", "v")
    val small = Seq("añejo", "キー", "other").toDF("sk")
    val got = BloomJoin.semiJoin(big, "k", small, "sk", 10L)
      .select("k").as[String].collect().toSet
    assert(got === Set("añejo", "キー"))
  }

  test("bloom probe participates in codegen and survives serialization") {
    val bloom = BloomJoin.bloomOf(Seq(1L, 2L).toDF("k"), "k", 10L)
    // repartition forces the expression through task serialization
    val out = (1L to 100L).toDF("k").repartition(7)
      .filter(might_contain_bloom($"k", bloom))
      .select("k").as[Long].collect().toSet
    assert(Set(1L, 2L).subsetOf(out))
    assert(out.size < 50)
  }
}
