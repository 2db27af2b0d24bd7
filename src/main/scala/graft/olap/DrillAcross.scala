package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DRILL-ACROSS — the cross-cube conformed-dimension query (Kimball's
  * "drill across": one report row sourced from SEVERAL fact tables
  * that share dimensions). The reference serves exactly this shape:
  * its Mondrian schema declares TWO cubes, `cubo_inmigrante` and
  * `cubo_emigrante`, over the SAME conformed dimensions
  * (`Schema_Trabajo_Final.xml:56-91` — shared Fecha/Via/Perfil
  * hierarchies), and the analyst question that spans them ("net
  * migration per province and month" = inmigrante − emigrante at a
  * shared grain) has no single-cube answer.
  *
  * The drill-across algorithm, Spark-first:
  *  1. aggregate EACH fact independently at the conformed grain —
  *     each side is one scan with map-side partial aggregation,
  *     collapsing to dim cardinality before anything crosses facts;
  *  2. FULL OUTER merge the two grain-sized results on the conformed
  *     level columns (full outer, not inner: a grain member present
  *     in one fact and absent in the other — a month with arrivals
  *     but no departures — must surface with NULL measures on the
  *     missing side, not vanish);
  *  3. derive cross-cube measures (net, ratio) AFTER the merge, as
  *     plain column expressions over both sides' aggregates.
  *
  * Never join fact-to-fact at row grain: at 100 TB that is a
  * corpus × corpus shuffle on non-keys. Here the only cross-fact
  * operation is a join of two ALREADY-AGGREGATED dim-sized relations
  * — broadcastable in practice, and AQE picks that up on its own.
  *
  * [[navigated]] composes this with [[AggNavigator]]: each cube side
  * answers from its own registered aggregate tables when one covers
  * the grain, so a fully-covered drill-across reads two dim-sized
  * parquet tables and no fact bytes at all — the Mondrian
  * virtual-cube serving path, made explicit.
  */
object DrillAcross {

  /** Drill across two fact tables: per-fact aggregation at the
    * conformed grain `on`, full-outer conformed merge, then `derived`
    * columns (e.g. `coalesce(col("in"), lit(0)) - coalesce(col("out"),
    * lit(0))` as the net). Measure aliases must be disjoint across the
    * two sides — they share the merged row. */
  def drillAcross(factA: DataFrame, measuresA: Seq[Column],
      factB: DataFrame, measuresB: Seq[Column],
      on: Seq[String], derived: Seq[Column] = Nil): DataFrame =
    drillAcrossAll(Seq(factA -> measuresA, factB -> measuresB), on, derived)

  /** N-way drill-across — Kimball's general form (a report row
    * sourced from SEVERAL fact tables): every fact aggregates
    * independently at the conformed grain, then the grain-sized
    * results fold left through conformed FULL OUTER merges. Chained
    * USING-joins coalesce the level columns pairwise, so a member
    * present in ANY fact keeps its key values; each fact's measures
    * are null where it has no rows at that member. Measure aliases
    * must be disjoint across all sides. The only cross-fact shuffles
    * are joins of dim-sized relations — same scale shape as the
    * two-way form, N−1 times. */
  def drillAcrossAll(facts: Seq[(DataFrame, Seq[Column])], on: Seq[String],
      derived: Seq[Column] = Nil): DataFrame = {
    require(on.nonEmpty, "drill-across needs at least one conformed level")
    require(facts.size >= 2, "drill-across needs at least two fact sides")
    require(facts.forall(_._2.nonEmpty),
      "each fact side needs at least one measure")
    val grouped = facts.map { case (f, ms) =>
      f.groupBy(on.map(col): _*).agg(ms.head, ms.tail: _*)
    }
    mergeConformed(grouped, on, derived)
  }

  /** The conformed-merge tail shared by every drill-across face
    * (direct, navigated, and [[CubeQuery]]'s mixed sides): chained
    * FULL OUTER USING-joins of the already-aggregated grain-sized
    * relations, then the derived cross-cube measures. */
  private[olap] def mergeConformed(grouped: Seq[DataFrame], on: Seq[String],
      derived: Seq[Column]): DataFrame = {
    // alias disjointness checked HERE, where the resolved names are
    // known — a clash would otherwise surface as a far-away
    // AMBIGUOUS_REFERENCE with no hint about the contract
    val names = grouped.flatMap(_.columns.drop(on.size))
    val clash = names.diff(names.distinct).distinct
    require(clash.isEmpty,
      s"cross-fact measure aliases must be disjoint, defined more than " +
        s"once: ${clash.sorted.mkString(", ")}")
    val j = grouped.reduceLeft(_.join(_, on, "full_outer"))
    if (derived.isEmpty) j
    else j.select(j.columns.map(col).toIndexedSeq ++ derived: _*)
  }

  /** [[drillAcross]] served through two aggregate-table registries:
    * each side routes via [[AggNavigator.navigate]] to its smallest
    * covering rollup (fact by-name — a covered side never constructs
    * its fact lineage, DrillAcrossSpec plan-asserts it). Measure
    * names must be disjoint across the registries: both sides'
    * measures land on one merged row. */
  def navigated(regA: AggNavigator.Registry, factA: => DataFrame,
      regB: AggNavigator.Registry, factB: => DataFrame,
      on: Seq[String], derived: Seq[Column] = Nil): DataFrame =
    navigatedAll(Seq(regA -> (() => factA), regB -> (() => factB)),
      on, derived)

  /** [[drillAcrossAll]] through N registries — each cube side routes
    * independently; facts are thunks so a covered side never
    * constructs its lineage. */
  def navigatedAll(
      sides: Seq[(AggNavigator.Registry, () => DataFrame)],
      on: Seq[String], derived: Seq[Column] = Nil): DataFrame = {
    require(sides.size >= 2, "drill-across needs at least two cube sides")
    val names = sides.flatMap(_._1.measures.map(_.name))
    val clash = names.diff(names.distinct).distinct
    require(clash.isEmpty,
      s"cross-cube measure names must be disjoint, defined more than " +
        s"once: ${clash.sorted.mkString(", ")}")
    val grouped = sides.map { case (reg, fact) =>
      AggNavigator.navigate(reg, fact(), on)
    }
    mergeConformed(grouped, on, derived)
  }
}
