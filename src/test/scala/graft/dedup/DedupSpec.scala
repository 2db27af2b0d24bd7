package graft.dedup

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = TestSpark.table("documents")

  /** Exact all-pairs Jaccard ground truth via shingle sets. */
  private def bruteforcePairs(threshold: Double) = {
    val sets = docs.select($"doc_id".as("id"),
      graft.functions.shingle_set($"text", 3).as("sh"))
    val a = sets.select($"id".as("id_a"), $"sh".as("sh_a"))
    val b = sets.select($"id".as("id_b"), $"sh".as("sh_b"))
    a.crossJoin(b).filter($"id_a" < $"id_b")
      .withColumn("j", Dedup.jaccard($"sh_a", $"sh_b"))
      .filter($"j" >= threshold)
      .select("id_a", "id_b")
  }

  test("exact dedup finds injected duplicates and only them") {
    val doubled = docs.select("doc_id", "text").unionByName(
      docs.select(($"doc_id" + 100000).as("doc_id"), $"text"))
    val groups = Dedup.exactGroups(doubled, "doc_id", "text")
    assert(groups.count() === docs.count()) // every text appears twice -> one group each
    assert(groups.filter($"n_dups" =!= 2).count() === 0)
    val kept = Dedup.dropExactDups(doubled, "doc_id", "text")
    assert(kept.count() === docs.count())
    assert(kept.filter($"doc_id" >= 100000).count() === 0) // keeps lowest id
  }

  test("LSH near-dup pairs achieve full recall vs brute force at 0.9") {
    val truth = bruteforcePairs(0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "corpus should contain planted near-dups")
    val got = Dedup.nearDupPairs(docs, "doc_id", "text", 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === truth)
  }

  test("simhash pairs are a subset of true low-hamming pairs and catch exact dups") {
    val doubled = docs.select("doc_id", "text").unionByName(
      docs.select(($"doc_id" + 100000).as("doc_id"), $"text"))
    val pairs = Dedup.simhashPairs(doubled, "doc_id", "text", maxHamming = 3)
    // every identity pair (d, d+100000) must be found: identical text ->
    // identical simhash -> same bucket, hamming 0
    val identity = pairs.filter($"id_b" === $"id_a" + 100000 && $"hamming" === 0)
    assert(identity.count() >= docs.count())
  }

  test("cosineDupPairs finds identical vectors") {
    val e = TestSpark.table("embeddings").select("vec_id", "embedding").limit(50)
    val doubled = e.unionByName(
      e.select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val pairs = Dedup.cosineDupPairs(doubled, "vec_id", "embedding", 0.999)
    assert(pairs.filter($"id_b" === $"id_a" + 100000).count() === 50)
  }

  test("cosineDupPairsLsh matches the exact O(n²) pairs on planted dups") {
    val e = TestSpark.table("embeddings").select("vec_id", "embedding").limit(50)
    val doubled = e.unionByName(
      e.select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
    val exact = Dedup.cosineDupPairs(doubled, "vec_id", "embedding", 0.999)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.cosineDupPairsLsh(doubled, "vec_id", "embedding", 0.999)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact) // identical vectors collide in every table
    assert(lsh.size === 50)
  }

  test("oversized buckets are dropped AND counted via the Observation hook") {
    // 5 ids in one degenerate bucket (cap 3) + 2 ids in a healthy bucket
    val bucketed = ((1 to 5).map(i => (0, 0L, i.toLong)) ++
      Seq((0, 1L, 10L), (0, 1L, 11L)))
      .toDF("table", "bucket", "id")
    val obs = new org.apache.spark.sql.Observation("drops")
    val pairs = Dedup.pairsFromBuckets(bucketed, Seq("table", "bucket"),
      maxBucket = 3, obs = Some(obs)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 11L))) // degenerate bucket never expanded
    assert(obs.get("dropped_rows") === 5L)
    assert(obs.get("max_bucket_size") === 5L)
  }

  test("simhashPairs rejects maxHamming outside the full-recall range") {
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
    }
    assert(e.getMessage.contains("[0, 7]"))
  }

  test("jaccardToProbe bounds and exact value") {
    val out = Dedup.jaccardToProbe(docs, "doc_id", "text", Seq("data", "table"))
    val vals = out.select("jaccard").collect().map(_.getDouble(0))
    assert(vals.forall(v => v >= 0.0 && v <= 1.0))
  }
}
