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
    * members with `defaults` attributes (dim columns neither keyed
    * nor defaulted fill NULL — the Kimball placeholder). Existing
    * members (real OR already-inferred) are untouched — re-running
    * over the same facts is a no-op, so the step is load-idempotent. */
  def ensureMembers(dim: DataFrame, facts: DataFrame,
      naturalKeys: Seq[String], idCol: String,
      defaults: Map[String, Column]): DataFrame = {
    val unseen = SurrogateKeys.unseenKeys(dim,
      facts.select(naturalKeys.map(col): _*).distinct(), naturalKeys)
    val fresh0 = SurrogateKeys.appendIdsAboveMax(dim, unseen,
      naturalKeys, idCol)
      .withColumn(InferredCol, lit(true))
    val fresh = defaults.foldLeft(fresh0) { case (df, (c, v)) =>
      df.withColumn(c, v)
    }
    dim.unionByName(fresh, allowMissingColumns = true)
  }

  /** A (late) dimension delivery: matched members take the arriving
    * attribute values in place — surrogates stable, `inferred` cleared
    * (an arriving NULL attribute is a real value and overwrites, it is
    * not "keep the placeholder") — and genuinely new keys append as
    * regular members above the current max id. Dim columns NOT listed
    * in `attrs` pass through untouched (an update never narrows the
    * dimension's schema); appended new members fill them with NULL. */
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
    // every dim column survives: attrs swap under a hit, the inferred
    // flag clears, everything else passes through
    val updated = dim.join(a, cond, "left")
      .select(dim.columns.toSeq.map { c =>
        if (attrs.contains(c))
          when(hit, col(s"__a_$c")).otherwise(col(c)).as(c)
        else if (c == InferredCol)
          when(hit, lit(false)).otherwise(col(InferredCol)).as(InferredCol)
        else col(c)
      }: _*)
    // keys the dimension has never seen: ordinary appends, not inferred
    val newRows = SurrogateKeys.unseenKeys(dim,
      onePerKey.select((naturalKeys ++ attrs).map(col): _*), naturalKeys)
    val appended = SurrogateKeys.appendIdsAboveMax(dim, newRows,
      naturalKeys, idCol)
      .withColumn(InferredCol, lit(false))
    updated.unionByName(appended, allowMissingColumns = true)
  }
}
