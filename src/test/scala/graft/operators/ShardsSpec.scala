package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = TestSpark.table("documents")

  test("shard assignment is deterministic, total, and in range") {
    val s1 = docs.withColumn("shard", Shards.shardCol("doc_id", 8))
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = docs.orderBy(rand()) // physical order must not matter
      .withColumn("shard", Shards.shardCol("doc_id", 8))
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 === s2)
    assert(s1.values.forall(s => s >= 0 && s < 8))
    assert(s1.size.toLong === docs.count())
  }

  test("shards are reasonably balanced and all populated") {
    val counts = Shards.profile(docs, "doc_id", 8)
      .select("shard", "n").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet === (0L until 8L).toSet, s"empty shard: $counts")
    val n = docs.count().toDouble
    // md5 is uniform; with n/8 expected per shard allow a generous
    // ±60% band so the test is about gross skew, not binomial noise
    counts.values.foreach { c =>
      assert(c > n / 8 * 0.4 && c < n / 8 * 1.6, s"skewed shards: $counts")
    }
  }

  test("arrange: each shard is contiguous and md5-sorted within its partition") {
    val arranged = Shards.arrange(docs.select("doc_id"), "doc_id", 4)
    val perPart = arranged
      .withColumn("pid", spark_partition_id())
      .select("pid", "shard", "sort_key")
      .collect().groupBy(_.getInt(0))
    assert(perPart.nonEmpty)
    perPart.foreach { case (_, rows) =>
      // partition-local order IS (shard, sort_key): shards contiguous,
      // intra-shard rows in deterministic md5 order
      val pairs = rows.map(r => (r.getLong(1), r.getString(2)))
      assert(pairs.sameElements(pairs.sorted),
        "partition rows not in (shard, sort_key) order")
    }
    // every row of a shard lives in exactly one physical partition
    val placement = arranged.withColumn("pid", spark_partition_id())
      .groupBy("shard").agg(countDistinct(col("pid")).as("np"))
      .select("np").as[Long].collect()
    assert(placement.forall(_ === 1L), "a shard spans physical partitions")
  }

  test("profile matches a driver-side recomputation of the scheme") {
    val hex = "0123456789abcdef"
    val expect = docs.select("doc_id").as[Long].collect().map { id =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (hex.indexOf(h(0)) * 16 + hex.indexOf(h(1))) % 8
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Shards.profile(docs, "doc_id", 8)
      .select("shard", "n").collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    assert(got === expect)
  }
}
