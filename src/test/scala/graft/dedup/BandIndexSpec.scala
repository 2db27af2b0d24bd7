package graft.dedup

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The executor-resident banded-candidate index ([[BandIndex]]) and
  * the indexed cross-dedup variant
  * ([[Dedup.crossNearDupPairsVsSignaturesIndexed]]): lookup parity
  * with the bucket-semi-join it replaces, pair parity with the lazy
  * plan on whole and SPLIT faces, the over-cap fallback, and the
  * execution-level pin that the indexed per-batch path never
  * evaluates the stored generations' `bands` column — the whole point
  * of the index is that the face scan is gone. */
class BandIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = TestSpark.table("documents")
  private lazy val sigs =
    Dedup.nearDupSignatures(docs, "doc_id", "text")

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("lookup returns exactly the bucket-semi-join rows") {
    val idx = BandIndex.build(sigs)
    try {
      assert(idx.indexedRows === sigs.count() * 8)
      val batch = docs.limit(50)
      val lb = batch.select(
        posexplode(graft.functions.minhash_bands(col("text"), 3, 8, 4))
          .as(Seq("band", "bucket")))
      val keys = lb.distinct().collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      val got = idx.lookup(spark, keys).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val want = sigs
        .select(col("id"), posexplode(col("bands")).as(Seq("band", "bucket")))
        .join(lb.distinct(), Seq("band", "bucket"), "left_semi")
        .select(col("band"), col("bucket"), col("id"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(want.nonEmpty, "the probe batch must touch stored buckets")
      assert(got === want)
      // a probe of unseen buckets finds nothing
      assert(idx.lookup(spark, Array((0, 12345L))).count() === 0)
    } finally idx.unpersist()
  }

  test("multi-partition build verifies hash alignment; pruned lookup " +
      "equals the semi join") {
    // force several partitions so per-partition key pruning actually
    // prunes (stats-sized test builds collapse to 1 partition, where
    // every key trivially belongs). alignedParts == numParts for every
    // partition is the REAL check that partitionOf reproduces Spark's
    // HashPartitioning — build flips it to 0 on any mismatch.
    val idx = BandIndex.build(sigs, numParts = 5)
    try {
      val parts = idx.parts.collect()
      assert(parts.length === 5)
      assert(parts.forall(_.alignedParts === 5),
        "a partition failed the build-time hash-alignment check")
      assert(parts.map(_.partIdx).sorted.toSeq === (0 until 5))
      parts.foreach { p =>
        assert(p.bucket.forall(b =>
          BandIndex.partitionOf(b, 5) == p.partIdx))
      }
      val lb = docs.limit(50).select(
        posexplode(graft.functions.minhash_bands(col("text"), 3, 8, 4))
          .as(Seq("band", "bucket"))).distinct()
      val keys = lb.collect().map(r => (r.getInt(0), r.getLong(1)))
      val got = idx.lookup(spark, keys).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val want = sigs
        .select(col("id"), posexplode(col("bands")).as(Seq("band", "bucket")))
        .join(lb, Seq("band", "bucket"), "left_semi")
        .select(col("band"), col("bucket"), col("id"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(want.nonEmpty)
      assert(got === want)
    } finally idx.unpersist()
  }

  test("lookupReleasable's handle destroys the key broadcast") {
    val idx = BandIndex.build(sigs)
    try {
      val keys = docs.limit(20).select(
        posexplode(graft.functions.minhash_bands(col("text"), 3, 8, 4))
          .as(Seq("band", "bucket"))).distinct()
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      val (df, release) = idx.lookupReleasable(spark, keys)
      assert(df.collect().nonEmpty) // consuming action completes first
      release()
      // the broadcast is gone for real: re-executing the lookup's
      // lineage (what a leaked-but-destroyed broadcast would face)
      // must fail, proving destroy() actually ran — not just unpersist
      intercept[Exception] { df.collect() }
    } finally idx.unpersist()
  }

  test("indexed pairs equal the lazy plan when the index covers the store") {
    val idx = BandIndex.build(sigs)
    try {
      val want = pairSet(Dedup.crossNearDupPairsVsSignatures(
        docs, "doc_id", "text", sigs, 0.9, smallRelationBytes = 0L))
      val got = pairSet(Dedup.crossNearDupPairsVsSignaturesIndexed(
        docs, "doc_id", "text", sigs, idx, None, 0.9,
        smallRelationBytes = 0L))
      assert(want.nonEmpty)
      assert(got === want)
    } finally idx.unpersist()
  }

  test("split faces (indexed generations + fresh batches) equal the lazy " +
      "plan over the union") {
    // mirror the ingest layout: the index covers an immutable majority,
    // fresh rows ride beside it un-indexed
    val gen = sigs.filter(col("id") % 3 =!= 0)
    val fresh = sigs.filter(col("id") % 3 === 0)
    val idx = BandIndex.build(gen)
    try {
      val want = pairSet(Dedup.crossNearDupPairsVsSignatures(
        docs, "doc_id", "text", sigs, 0.9, smallRelationBytes = 0L))
      val got = pairSet(Dedup.crossNearDupPairsVsSignaturesIndexed(
        docs, "doc_id", "text", gen.unionByName(fresh), idx, Some(fresh),
        0.9, smallRelationBytes = 0L))
      assert(got === want)
    } finally idx.unpersist()
  }

  test("a union of per-generation sub-indexes equals one index over " +
      "the whole store") {
    val genA = sigs.filter(col("id") % 3 === 0)
    val genB = sigs.filter(col("id") % 3 === 1)
    val genC = sigs.filter(col("id") % 3 === 2)
    val subs = Seq(genA, genB, genC).map(BandIndex.build(_))
    val whole = BandIndex.build(sigs)
    try {
      val composed = BandIndex.union(subs)
      assert(composed.indexedRows === whole.indexedRows)
      val keys = docs.limit(40).select(
        posexplode(graft.functions.minhash_bands(col("text"), 3, 8, 4))
          .as(Seq("band", "bucket"))).distinct()
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      def rows(i: BandIndex) = i.lookup(spark, keys).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val got = rows(composed)
      assert(got.nonEmpty)
      assert(got === rows(whole))
      // single-member union is the member itself (no wrapper layers)
      assert(BandIndex.union(Seq(whole)) eq whole)
    } finally (subs :+ whole).foreach(_.unpersist())
  }

  test("over the key cap the call falls back to the fetched scan, " +
      "same output") {
    val idx = BandIndex.build(sigs)
    try {
      val want = pairSet(Dedup.crossNearDupPairsVsSignatures(
        docs, "doc_id", "text", sigs, 0.9, smallRelationBytes = 0L))
      val got = pairSet(Dedup.crossNearDupPairsVsSignaturesIndexed(
        docs, "doc_id", "text", sigs, idx, None, 0.9,
        smallRelationBytes = 0L, maxLookupKeys = 1))
      assert(got === want)
    } finally idx.unpersist()
  }

  test("the indexed per-batch path never evaluates stored `bands` — " +
      "the face scan is gone, not just pruned") {
    // poison the store's bands column: any row whose band array the
    // per-batch plan evaluates blows up the job (the SigStoreSpec
    // poison idiom — execution-level truth, AQE-proof). The index is
    // built BEFORE poisoning (the fold-epoch build is allowed to read
    // bands; the claim is about every batch after it).
    val idx = BandIndex.build(sigs)
    try {
      val poisoned = sigs.withColumn("bands",
        when(assert_true(col("id") < lit(Long.MinValue),
          lit("stored bands evaluated")).isNull, col("bands")))
      // vacuity guard: the same poisoned store on the FETCHED path
      // (whole-face candidate scan) must trip
      intercept[Exception] {
        Dedup.crossNearDupPairsVsSignaturesFetched(docs.limit(5), "doc_id",
          "text", poisoned, 0.9, smallRelationBytes = 0L).count()
      }
      // a matching batch through the INDEX survives and still pairs
      val batch = docs.limit(5)
      val got = pairSet(Dedup.crossNearDupPairsVsSignaturesIndexed(
        batch, "doc_id", "text", poisoned, idx, None, 0.9,
        smallRelationBytes = 0L))
      val want = pairSet(Dedup.crossNearDupPairsVsSignatures(
        batch, "doc_id", "text", sigs, 0.9, smallRelationBytes = 0L))
      assert(want.nonEmpty, "the batch must match itself in the store")
      assert(got === want)
    } finally idx.unpersist()
  }
}
