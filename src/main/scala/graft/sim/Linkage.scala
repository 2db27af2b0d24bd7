package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution): blocked candidate generation +
  * weighted multi-field similarity scoring + best-match resolution —
  * the dedup-across-sources pipeline (customer files, vendor masters)
  * the reference's fuzzy classification gestures at
  * (`Datos/preprocessing.py:158-163`), assembled from the engine's
  * own pieces.
  *
  * Scale shape: candidates come ONLY from a blocking equi-join
  * (nation/zip/length-bucket — the caller's blocking keys), never a
  * cross join; scoring is a map-side expression chain of codegen'd
  * [[graft.functions.JaroWinkler]] calls; resolution is the bounded
  * top-1 heap per left entity ([[graft.features.Features
  * .topKPerGroupBounded]]), so a hot block never materializes a
  * sorted candidate list. Blocking recall is the caller's contract
  * (pairs split across blocks are never compared — standard ER
  * practice; use multiple passes with different keys for higher
  * recall).
  */
object Linkage {

  /** Candidate pairs with a weighted Jaro–Winkler score in [0, 1].
    *
    * @param blockKeys (leftCol, rightCol) equality keys
    * @param fields    (leftCol, rightCol, weight) similarity fields —
    *                  compared case-folded; weights need not sum to 1
    */
  def scoredPairs(left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      blockKeys: Seq[(String, String)],
      fields: Seq[(String, String, Double)]): DataFrame = {
    require(blockKeys.nonEmpty, "blocking keys required (no cross joins)")
    require(fields.nonEmpty && fields.forall(_._3 > 0), "positive field weights")
    val l = left.as("__ll")
    val r = right.as("__lr")
    val cond = blockKeys.map { case (a, b) =>
      col(s"__ll.$a") === col(s"__lr.$b")
    }.reduce(_ && _)
    val totalW = fields.map(_._3).sum
    val score: Column = fields.map { case (a, b, w) =>
      graft.functions.jaro_winkler(
        lower(col(s"__ll.$a")), lower(col(s"__lr.$b"))) * lit(w)
    }.reduce(_ + _) / lit(totalW)
    l.join(r, cond)
      .select(col(s"__ll.$leftId").as("left_id"),
        col(s"__lr.$rightId").as("right_id"), score.as("score"))
  }

  /** Sorted-neighborhood blocking — the OTHER classic ER candidate
    * generator: records adjacent in a global sort order (within `w`
    * positions) become candidate pairs, catching typos that corrupt a
    * HASH blocking key itself (hash blocking sends "Smith"/"Smith "
    * to different blocks; sorted by normalized name they are
    * neighbors). Use both passes for serious recall.
    *
    * Exact and scale-safe: the global rank is the two-phase
    * [[graft.operators.PrefixSum]] shape — range-partitioned sort,
    * per-partition row_number (parallel windows), partition offsets
    * from a P-row count relation (the bounded-global-window pattern)
    * — and the "within w positions" join is
    * [[graft.operators.RangeJoin.pointInInterval]] on the rank
    * (bucketized equi-join, never a rank-inequality nested loop).
    * Nothing data-sized ever sits in one task. Output:
    * `(id_a, id_b)` with `id_a` earlier in sort order.
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
      sortCol: String, w: Int): DataFrame = {
    require(w >= 1, "window must be >= 1")
    // the global rank below consumes the range exchange TWICE (the
    // offsets branch and the ranked branch); their partition ids only
    // agree because Spark's exchange reuse dedups the two subtrees
    // into ONE materialized exchange. With reuse disabled each branch
    // would re-sample its own boundaries and the ranks would go
    // silently wrong — fail loudly instead (a value-derived bucket,
    // the PrefixSum fix, needs a numeric order key; sortCol here is
    // an arbitrary orderable)
    require(df.sparkSession.conf
        .get("spark.sql.exchange.reuse", "true").toBoolean,
      "sortedNeighborhoodPairs requires spark.sql.exchange.reuse=true: " +
        "its two consumers of the range exchange must share one " +
        "sampled partitioning")
    // no sortWithinPartitions: spark_partition_id doesn't depend on
    // intra-partition order, and the pid window re-sorts anyway
    val sorted = df.select(col(idCol).as("id"), col(sortCol).as("k"))
      .filter(col("k").isNotNull)
      .repartitionByRange(col("k"), col("id"))
      .withColumn("pid", spark_partition_id())
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid")).orderBy(col("k"), col("id"))
    val local = sorted.withColumn("lrn", row_number().over(pw))
    // P-row count relation — pinned partition marks the single-task
    // window intentional (no spurious WindowExec scale warning)
    val offW = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.plans.PinnedWindow.key(col("pid"))).orderBy(col("pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(offW), lit(0L)))
      .select(col("pid"), col("off"))
    val ranked = local.join(broadcast(offsets), Seq("pid"))
      .select(col("id"), (col("lrn") + col("off")).as("rank"))
    val points = ranked.select(col("rank").as("p"), col("id").as("id_b"))
    val intervals = ranked.select((col("rank") + 1).as("lo"),
      (col("rank") + w).as("hi"), col("id").as("id_a"))
    graft.operators.RangeJoin.pointInInterval(points, "p",
        intervals, "lo", "hi", equiKeys = Seq.empty, bucketWidth = w.toLong)
      .select(col("id_a"), col("id_b"))
  }

  /** Best match per LEFT entity (highest score; ties to the smallest
    * right id) — bounded-heap top-1, never a per-block sort. */
  def bestMatch(left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      blockKeys: Seq[(String, String)],
      fields: Seq[(String, String, Double)]): DataFrame = {
    // score.isNotNull: a null similarity field (jaro_winkler
    // null-propagates) nulls the whole weighted score, and the heap's
    // struct ordering sorts a null sort key FIRST — an uninformative
    // pair would evict every real candidate
    val scored = scoredPairs(left, leftId, right, rightId, blockKeys, fields)
      .filter(col("score").isNotNull)
    graft.features.Features.topKPerGroupBounded(scored, "left_id",
        struct(negate(col("score")).as("ns"), col("right_id").as("right_id")), 1)
      .select(col("left_id"), col("right_id"), (-col("ns")).as("score"))
  }

  /** Survivorship rules for golden-record construction. */
  sealed trait Survive
  /** Highest `orderCol` wins ("most recent non-null" when orderCol is
    * a timestamp); order ties break to the largest value. `orderCol`
    * must be non-null — a null order field makes the rank struct's
    * comparison engine-defined, so coalesce a sentinel first. */
  final case class Latest(orderCol: String) extends Survive
  /** Most frequent non-null value wins; count ties break to the
    * largest value. */
  case object MostFrequent extends Survive

  /** Golden record per cluster — the survivorship step that turns a
    * duplicate CLUSTER (from [[bestMatch]] pairs fed through
    * [[graft.dedup.Dedup.dupClusters]]-style transitive closure) into
    * ONE canonical row. Each attribute picks its winner independently
    * under its declared rule, nulls never win over values, and every
    * tie breaks deterministically — the same records give the same
    * golden record on any engine, partitioning, or rerun.
    *
    * Scale shape: `Latest` rules fuse into a single max_by aggregation
    * pass (null values sink via a two-level struct ordering);
    * each `MostFrequent` rule adds one (cluster, value)-grain count
    * aggregate joined back — all keyed on the cluster id, so the
    * exchanges line up. Output is clusters-sized. */
  def goldenRecords(records: DataFrame, clusterCol: String,
      rules: Seq[(String, Survive)]): DataFrame = {
    require(rules.nonEmpty, "need at least one attribute rule")
    val maxByAggs = rules.collect { case (c, Latest(ord)) =>
      // rank struct: non-null beats null, then orderCol, then the
      // value itself as the deterministic tiebreak (largest wins) —
      // plain lexicographic struct ordering an external engine's
      // arg-max reproduces verbatim
      max_by(col(c), struct(col(c).isNotNull.as("nn"), col(ord).as("o"),
        col(c).as("tb"))).as(c)
    }
    val base =
      if (maxByAggs.isEmpty)
        records.select(col(clusterCol)).distinct()
      else
        records.groupBy(col(clusterCol)).agg(maxByAggs.head, maxByAggs.tail: _*)
    rules.collect { case (c, MostFrequent) => c }.foldLeft(base) { (acc, c) =>
      val winner = records.filter(col(c).isNotNull)
        .groupBy(col(clusterCol), col(c))
        .agg(count(lit(1)).as("__n"))
        .groupBy(col(clusterCol))
        .agg(max_by(col(c), struct(col("__n").as("n"), col(c).as("tb"))).as(c))
      acc.join(winner, Seq(clusterCol), "left")
    }
  }
}
