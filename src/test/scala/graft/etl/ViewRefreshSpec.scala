package graft.etl

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-scoped view refresh: untouched partitions keep their
  * exact files; the refreshed view equals the full recompute. */
class ViewRefreshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val n = 8

  private lazy val facts = TestSpark.table("orders")
    .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  private lazy val dimV1 = TestSpark.table("customer")
    .select(col("c_custkey"), col("c_mktsegment"))

  private def view(dim: DataFrame): DataFrame =
    facts.join(broadcast(dim), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("c_custkey"),
        col("c_mktsegment"))

  // files per partition dir: name → (length, mtime)
  private def fileState(path: String): Map[String, Map[String, (Long, Long)]] = {
    val base = new java.io.File(path)
    base.listFiles().filter(f => f.isDirectory &&
      f.getName.startsWith(s"${ViewRefresh.BucketCol}=")).map { d =>
      d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    }.toMap
  }

  test("refresh rewrites only the affected buckets, byte-identically elsewhere") {
    val root = java.nio.file.Files.createTempDirectory("vr_spec").toString
    val path = s"$root/view"
    ViewRefresh.materialize(view(dimV1), col("c_custkey"), n, path)
    val before = fileState(path)

    val dimV2 = dimV1.withColumn("c_mktsegment",
      when(col("c_custkey") % 29 === 0, lit("UPDATED"))
        .otherwise(col("c_mktsegment")))
    val changed = dimV1.filter(col("c_custkey") % 29 === 0)
      .select(col("c_custkey"))
    val buckets = ViewRefresh.affectedBuckets(changed, col("c_custkey"), n)
    assert(buckets.nonEmpty && buckets.size < n,
      s"fixture must leave some buckets untouched, got $buckets")
    ViewRefresh.refresh(view(dimV2), col("c_custkey"), n, buckets, path)
    val after = fileState(path)

    val touched = buckets.map(b => s"${ViewRefresh.BucketCol}=$b").toSet
    for ((dir, files) <- before if !touched.contains(dir))
      assert(after(dir) === files, s"untouched partition $dir changed")
    assert(touched.forall(d => after(d) != before(d)),
      "affected partitions should have been rewritten")

    // the refreshed view IS the full recompute
    val got = spark.read.parquet(path)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,2)"))
        .as("rev"))
      .orderBy("c_mktsegment").collect().toSeq.map(_.toSeq)
    val want = view(dimV2)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,2)"))
        .as("rev"))
      .orderBy("c_mktsegment").collect().toSeq.map(_.toSeq)
    assert(got === want)
  }

  test("co-bucketed source layout: the refresh filter prunes the fact SCAN, cost scales with affected buckets") {
    val root = java.nio.file.Files.createTempDirectory("vr_prune").toString
    val factPath = s"$root/fact"
    val path = s"$root/view"
    // the fact laid out co-bucketed on ITS dim key copy
    ViewRefresh.materializeSource(facts, col("o_custkey"), n, factPath)
    // view built FROM the layout, carrying the partition column
    def viewFrom(dim: DataFrame): DataFrame =
      spark.read.parquet(factPath)
        .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("c_custkey"),
          col("c_mktsegment"), col(ViewRefresh.BucketCol))
    ViewRefresh.materialize(viewFrom(dimV1), col("c_custkey"), n, path)

    val dimV2 = dimV1.withColumn("c_mktsegment",
      when(col("c_custkey") === 1, lit("UPDATED"))
        .otherwise(col("c_mktsegment")))
    val changed = dimV1.filter(col("c_custkey") === 1).select(col("c_custkey"))
    val buckets = ViewRefresh.affectedBuckets(changed, col("c_custkey"), n)
    assert(buckets.size === 1)

    // plan assert: the scoped frame's fact scan carries the bucket
    // predicate as a PARTITION filter, not a post-join filter
    val scoped = viewFrom(dimV2)
      .filter(col(ViewRefresh.BucketCol).isin(buckets: _*))
    val planText = scoped.queryExecution.executedPlan.toString
    val partFilters =
      "PartitionFilters: \\[([^\\]]*)\\]".r.findAllMatchIn(planText)
        .map(_.group(1)).toSeq
    assert(partFilters.exists(_.contains(ViewRefresh.BucketCol)),
      s"bucket filter must prune the fact scan:\n$planText")

    // cost probe: rows actually read scale with affected buckets
    def rowsScanned(df: DataFrame): Long = {
      df.collect()
      val top = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      top.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
    }
    val total = facts.count()
    val pruned = rowsScanned(spark.read.parquet(factPath)
      .filter(col(ViewRefresh.BucketCol).isin(buckets: _*)))
    assert(pruned < total / 2,
      s"1 of $n buckets should read a fraction of the fact: $pruned of $total")

    // and the refresh through the carried column lands the same state
    // as a full recompute
    ViewRefresh.refresh(viewFrom(dimV2), col("c_custkey"), n, buckets, path)
    val got = spark.read.parquet(path)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      .orderBy("c_mktsegment").collect().map(r => r.getString(0) -> r.getLong(1))
    val want = view(dimV2)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      .orderBy("c_mktsegment").collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq === want.toSeq)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("a carried bucket column from a MISMATCHED layout fails the refresh loudly") {
    val root = java.nio.file.Files.createTempDirectory("vr_mismatch").toString
    val path = s"$root/view"
    ViewRefresh.materialize(view(dimV1), col("c_custkey"), n, path)
    // the source was bucketed on the WRONG key (orderkey, not the dim
    // key) — refreshing through that carried column would swap wrong
    // partitions; the verify pass must reject it instead
    val wrong = view(dimV1).withColumn(ViewRefresh.BucketCol,
      ViewRefresh.bucketOf(col("o_orderkey"), n))
    val e = intercept[IllegalArgumentException] {
      ViewRefresh.refresh(wrong, col("c_custkey"), n, Seq(0, 1), path)
    }
    assert(e.getMessage.contains("bucketed on a different key"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("a deletion that empties a bucket removes its stale partition") {
    import spark.implicits._
    // 3 keys spread over 64 buckets → each key alone in its bucket
    val nb = 64
    val dimA = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "seg")
    val factsT = Seq((1L, 10.0), (2L, 20.0), (2L, 21.0), (3L, 30.0))
      .toDF("k", "amount")
    def v(d: org.apache.spark.sql.DataFrame) = factsT.join(d, Seq("k"))
    val root = java.nio.file.Files.createTempDirectory("vr_del").toString
    val path = s"$root/view"
    ViewRefresh.materialize(v(dimA), col("k"), nb, path)
    assert(spark.read.parquet(path).filter(col("k") === 2L).count() === 2)
    // member k=2 is DELETED from the dimension: the inner join drops
    // its rows, its bucket's recomputed content is empty — dynamic
    // overwrite alone would keep the stale files
    val dimB = dimA.filter(col("k") =!= 2L)
    val changed = Seq(Tuple1(2L)).toDF("k")
    val buckets = ViewRefresh.affectedBuckets(changed, col("k"), nb)
    ViewRefresh.refresh(v(dimB), col("k"), nb, buckets, path)
    val left = spark.read.parquet(path)
    assert(left.filter(col("k") === 2L).count() === 0,
      "deleted member's rows must not survive the refresh")
    assert(left.count() === 2)
  }

  test("bucketOf is stable across calls (refresh targets the right partition)") {
    val a = ViewRefresh.affectedBuckets(dimV1.limit(50).select("c_custkey"),
      col("c_custkey"), n)
    val b = ViewRefresh.affectedBuckets(dimV1.limit(50).select("c_custkey"),
      col("c_custkey"), n)
    assert(a === b)
  }
}
