package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: times the round-3 operators on a 10× union-replicated
  * corpus (ids offset per replica so key cardinality scales too) and
  * prints one JSON line of seconds per operator. The point is the
  * SHAPE of the growth, not absolute numbers: an operator whose cost
  * is linear-ish in rows at 10× has no hidden quadratic/driver
  * bottleneck waiting at 1000×.
  *
  * Usage: `sbt "runMain graft.ScaleProbe /root/testdata/sf0.1 10"`
  */
object ScaleProbe {

  private def replicate(df: DataFrame, idCols: Seq[String], k: Int): DataFrame =
    (0 until k).map { i =>
      idCols.foldLeft(df)((d, c) =>
        d.withColumn(c, col(c) + lit(i.toLong * 100000000L)))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): (String, Double, Long) = {
      val s = System.nanoTime(); val n = f
      (name, (System.nanoTime() - s) / 1e9, n)
    }
    def tbl(n: String) = spark.read.parquet(s"$dir/$n.parquet")

    val partK = replicate(tbl("part"), Seq("p_partkey"), k).cache()
    val liK = replicate(tbl("lineitem"), Seq("l_orderkey"), k).cache()
    val docsK = replicate(tbl("documents"), Seq("doc_id"), k).cache()
    Seq(partK, liK, docsK).foreach(_.count()) // materialize outside timings

    val results = Seq(
      t("skyline") {
        operators.Skyline.skyline(
          partK.select("p_partkey", "p_size", "p_retailprice"),
          Seq("p_size", "p_retailprice")).count()
      },
      t("bloom_semi") {
        val hot = tbl("orders").filter(col("o_totalprice") > 400000d)
        operators.BloomJoin.semiJoin(liK, "l_orderkey", hot, "o_orderkey",
          expectedItems = 40000L).count()
      },
      t("hierarchy") {
        operators.Hierarchy.rootAndDepth(
          partK.select(col("p_partkey").as("id"),
            when(col("p_partkey") % 100000000L >= 10,
              expr("p_partkey DIV 10")).as("parent")),
          "id", "parent").count()
      },
      t("inverted_index_search") {
        text.TextOps.searchAnd(
          text.TextOps.invertedIndex(docsK, "doc_id", "text"),
          Seq("batch", "scan", "join")).count()
      },
      t("cross_near_dup") {
        dedup.Dedup.crossNearDupPairs(
          docsK.filter(col("doc_id") % 2 === 0), "doc_id", "text",
          docsK.filter(col("doc_id") % 2 === 1), "doc_id", "text",
          threshold = 0.9).count()
      },
      t("gaps") {
        operators.Gaps.missingRanges(
          liK.select(col("l_orderkey")).filter(col("l_orderkey") % 10 =!= 3),
          "l_orderkey", bucketWidth = 100000L).count()
      },
      // round-4 ops
      t("cumsum_two_level") {
        // bucketWidth 4 over ~6M distinct keys → ~1.5M buckets, far
        // past the 100k cap: exercises the distributed offset fallback
        val seq = liK.select(
          (col("l_orderkey") * 10 + col("l_linenumber")).as("ord"),
          col("l_quantity").cast("long").as("v"))
        operators.PrefixSum.cumsum(seq, "ord", "v", "cs",
          bucketWidth = 4, maxDriverBuckets = 100000L).count()
      },
      t("auc_rank_window") {
        // ~100k distinct grid-quantized scores through the bounded
        // global rank window — the q133 shape at 10×
        val scored = liK.select(
          when(col("l_returnflag") === "R", 1).otherwise(0).as("label"),
          round(col("l_extendedprice").cast("double") / 1000.0, 2).as("score"))
        ml.Metrics.aucBinary(scored, "label", "score").count()
      },
      t("basket_rules") {
        // pair blowup bounded by basket size (≤7 lines/order): the
        // a<b self-join at 6M item rows
        operators.Basket.pairRules(
          liK.select(col("l_orderkey"), (col("l_partkey") % 100).as("i")),
          "l_orderkey", "i", minPairCount = 50L).count()
      },
      t("mad_outliers") {
        graft.features.Features.madOutliers(
          liK.select(col("l_returnflag"), col("l_extendedprice")
            .cast("double").as("p")),
          "l_returnflag", "p", k = 4.0).count()
      },
      t("gini_by_group") {
        ml.Metrics.giniByGroup(
          liK.select(col("l_returnflag"), col("l_extendedprice")),
          "l_returnflag", "l_extendedprice").count()
      })

    val json = results.map { case (n, sec, rows) =>
      f""""$n":{"sec":$sec%.2f,"rows":$rows}"""
    }.mkString("{", ",", s""","replication":$k}""")
    // [probe] prefix: greppable past sbt log noise
    println(s"[probe] $json")
    spark.stop()
  }
}
