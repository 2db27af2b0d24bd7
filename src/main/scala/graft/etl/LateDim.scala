package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LATE-ARRIVING DIMENSION handling (Kimball's inferred members) — the
  * load-order hazard the reference's row-at-a-time ETL sidesteps by
  * always loading dims first (`etl_final.ktr` runs the dimension hops
  * before the fact hop): in a real warehouse facts routinely arrive
  * BEFORE their dimension rows (a sale for a product whose master-data
  * feed lags). The batch answer:
  *
  *  1. [[ensureMembers]] — every fact key unseen by the dimension gets
  *     an INFERRED member: surrogate key above the current max (the
  *     [[SurrogateKeys.dimAppend]] contract), placeholder attributes,
  *     `inferred = true`. Facts can then resolve surrogates
  *     immediately — no fact is ever parked or dropped.
  *  2. [[scd1Arrive]] — when the real dimension row shows up later, it
  *     overwrites the inferred member's attributes IN PLACE (SCD1):
  *     the surrogate key is stable, so facts keyed in step 1 resolve
  *     the corrected attributes WITHOUT any fact-table rewrite — at
  *     100 TB that stability is the whole point, a re-key would
  *     rewrite the corpus.
  *
  * Scale shape: both steps are dim-sized — an anti-join + tiny id
  * assignment, and a dim⋈arrivals outer-shaped join; the fact table is
  * touched only by the usual broadcast surrogate resolve. Natural keys
  * compare null-safely throughout (`<=>`), matching the
  * CombinationLookup convention (a null key is a value with its own
  * member).
  */
object LateDim {

  val InferredCol = "inferred"

  /** Initial load: surrogate ids in canonical key order, all members
    * real. Attribute columns ride along. */
  def init(dim: DataFrame, naturalKeys: Seq[String], idCol: String): DataFrame =
    SurrogateKeys.assignIds(dim, naturalKeys, idCol)
      .withColumn(InferredCol, lit(false))

  /** Guarantee every fact key resolves: unseen keys become inferred
    * members with `defaults` attributes. Existing members (real OR
    * already-inferred) are untouched — re-running over the same facts
    * is a no-op, so the step is load-idempotent. */
  def ensureMembers(dim: DataFrame, facts: DataFrame,
      naturalKeys: Seq[String], idCol: String,
      defaults: Map[String, Column]): DataFrame = {
    val ex = dim.select(naturalKeys.map(c => col(c).as(s"__e_$c")): _*)
    val cond = naturalKeys.map(k => col(k) <=> col(s"__e_$k")).reduce(_ && _)
    val unseen = facts.select(naturalKeys.map(col): _*).distinct()
      .join(ex, cond, "left_anti")
    val maxId = dim.agg(coalesce(max(col(idCol)), lit(0L))).head().getLong(0)
    val fresh0 = SurrogateKeys.assignIds(unseen, naturalKeys, idCol)
      .withColumn(idCol, col(idCol) + lit(maxId))
      .withColumn(InferredCol, lit(true))
    val fresh = defaults.foldLeft(fresh0) { case (df, (c, v)) =>
      df.withColumn(c, v)
    }
    dim.unionByName(fresh)
  }

  /** A (late) dimension delivery: matched members take the arriving
    * attribute values in place — surrogates stable, `inferred` cleared
    * (an arriving NULL attribute is a real value and overwrites, it is
    * not "keep the placeholder") — and genuinely new keys append as
    * regular members above the current max id. */
  def scd1Arrive(dim: DataFrame, arrivals: DataFrame,
      naturalKeys: Seq[String], idCol: String,
      attrs: Seq[String]): DataFrame = {
    // one row per key BEFORE the update join: a delivery carrying the
    // same key twice would otherwise fan the dim row out (a LEFT join
    // duplicates per match) — which row of a dup pair wins is
    // undefined here by design, matching SCD1's "the source must be
    // keyed" contract
    val onePerKey = arrivals.dropDuplicates(naturalKeys)
    val a = onePerKey
      .select((naturalKeys ++ attrs).map(c => col(c).as(s"__a_$c")) :+
        lit(true).as("__a_hit"): _*)
    val cond = naturalKeys.map(k => col(k) <=> col(s"__a_$k")).reduce(_ && _)
    val hit = col("__a_hit")
    val updated = dim.join(a, cond, "left")
      .select(naturalKeys.map(col) ++
        attrs.map(c => when(hit, col(s"__a_$c")).otherwise(col(c)).as(c)) ++
        Seq(col(idCol),
          when(hit, lit(false)).otherwise(col(InferredCol))
            .as(InferredCol)): _*)
    // keys the dimension has never seen: ordinary appends, not inferred
    val ex = dim.select(naturalKeys.map(c => col(c).as(s"__e_$c")): _*)
    val exCond = naturalKeys.map(k => col(k) <=> col(s"__e_$k")).reduce(_ && _)
    val newRows = onePerKey.select((naturalKeys ++ attrs).map(col): _*)
      .join(ex, exCond, "left_anti")
    val maxId = dim.agg(coalesce(max(col(idCol)), lit(0L))).head().getLong(0)
    val appended = SurrogateKeys.assignIds(newRows, naturalKeys, idCol)
      .withColumn(idCol, col(idCol) + lit(maxId))
      .withColumn(InferredCol, lit(false))
    updated.unionByName(appended.select(updated.columns.map(col): _*))
  }
}
