package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-path analysis: the first-order transition matrix over
  * per-entity event sequences — P(next = to | current = from), the
  * Markov summary behind "what do users do after X" path analysis and
  * next-event-model feature prep.
  *
  * Scale shape: ONE shuffle partitions events by entity for the
  * `lead` window (per-entity sort, never global); consecutive pairs
  * then reduce to the (event-types²)-sized count matrix — tiny by
  * definition — and the row normalization joins the from-marginal
  * over that tiny relation. The order key must be made unique by a
  * tiebreaker column: a ROWS-frame window under a tied sort is
  * partitioning-dependent (same contract as
  * [[graft.features.Features.forwardFill]]).
  */
object Paths {

  /** @return (from, to, cnt, prob) — prob row-normalized over each
    *         `from`'s outgoing transitions, exact-count division. */
  def transitionMatrix(events: DataFrame, entityCol: String,
      typeCol: String, tsCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieBreak))
    val pairs = events
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(typeCol).as("from"), col("__to").as("to"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy(col("from")).agg(sum(col("cnt")).as("__t"))
    pairs.join(totals, Seq("from"))
      .select(col("from"), col("to"), col("cnt"),
        round(col("cnt").cast("double") / col("__t").cast("double"), 6)
          .as("prob"))
  }
}
