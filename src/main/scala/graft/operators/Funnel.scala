package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion funnel — the product-analytics staple the
  * reference's BI layer would chart (stage-by-stage user progression):
  * an entity reaches stage i at its EARLIEST stage-i event STRICTLY
  * AFTER its stage-(i−1) reach time (first-touch attribution; the
  * strict inequality means a simultaneous pair cannot satisfy two
  * stages, so a chain never completes "for free" on one timestamp).
  *
  * Scale shape: stage k is one equi-join of the stage-k event slice
  * against the (entities-sized) reach frame plus a min-aggregation —
  * every hop hashes on the SAME entity key, so the exchanges line up,
  * and the full event log is scanned once per stage WITH the stage
  * filter pushed to the scan (never re-shuffled whole). k is the
  * funnel length (tiny); entity state is one row per reached entity.
  * A window/sort formulation would shuffle and sort every event of
  * every user once — strictly worse at log scale.
  */
object Funnel {

  /** Per-entity reach times: (entity, ts_1 … ts_k), one row per entity
    * that reached stage 1; ts_i is null once the chain breaks. */
  def reachTimes(events: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(col(entityCol)).agg(min(col(tsCol)).as("ts_1"))
    for ((st, i) <- stages.tail.zipWithIndex) {
      val n = i + 2
      val step = events.filter(col(typeCol) === st)
        .join(acc.select(col(entityCol), col(s"ts_${n - 1}")), Seq(entityCol))
        .filter(col(tsCol) > col(s"ts_${n - 1}"))
        .groupBy(col(entityCol)).agg(min(col(tsCol)).as(s"ts_$n"))
      acc = acc.join(step, Seq(entityCol), "left")
    }
    acc
  }

  /** Funnel summary: one row per stage with the entity count that
    * reached it and the conversion rate from the previous stage. The
    * per-stage counts reduce to ONE row (k longs); the stage spine is
    * a k-row literal frame cross-joined against it, and the division
    * happens in the plan on exact counts — cross-engine stable. */
  def counts(events: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    val reach = reachTimes(events, entityCol, typeCol, tsCol, stages)
    val aggs = stages.indices.map(i =>
      count(col(s"ts_${i + 1}")).as(s"u_${i + 1}"))
    val row = reach.agg(aggs.head, aggs.tail: _*)
    val spark = events.sparkSession
    import spark.implicits._
    val spine = stages.zipWithIndex
      .map { case (st, i) => (i + 1L, st) }.toDF("stage", "event_type")
    spine.crossJoin(broadcast(row))
      .select(col("stage"), col("event_type"),
        stages.indices.map(i =>
          when(col("stage") === (i + 1), col(s"u_${i + 1}")))
          .reduce(coalesce(_, _)).as("users"),
        stages.indices.map(i =>
          when(col("stage") === (i + 1),
            if (i == 0) lit(1.0)
            else round(try_divide(col(s"u_${i + 1}").cast("double"),
              col(s"u_$i").cast("double")), 6)))
          .reduce(coalesce(_, _)).as("conversion"))
      .orderBy("stage")
  }
}
