package graft.olap

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Mondrian-cube query semantics (`Schema_Trabajo_Final.xml:2-91`) over
  * a star-joined DataFrame: drill-down hierarchies are ordered column
  * lists; the "All" member and level subtotals come from `rollup` +
  * `grouping`; measures are plain aggregates (count / avg in the
  * reference; any `Column` aggregate here).
  *
  * All of this is pure Catalyst: `rollup` compiles to an Expand +
  * partial/final HashAggregate, which map-side combines before the
  * shuffle — the right plan at any scale.
  */
object Cube {

  final case class Hierarchy(name: String, levels: Seq[String])

  /** Slice at explicit levels: a plain groupBy (no subtotals). */
  def slice(wide: DataFrame, levels: Seq[String], measures: Seq[Column],
      slicers: Seq[Column] = Nil): DataFrame = {
    val base = slicers.foldLeft(wide)(_.filter(_))
    base.groupBy(levels.map(col): _*).agg(measures.head, measures.tail: _*)
  }

  /** Drill-down with subtotals + grand total ("All" member): rollup over
    * the hierarchy prefix. `level_mask` identifies the subtotal depth
    * (0 = leaf row, higher bits = rolled-up levels), mirroring
    * Mondrian's member levels. */
  def drillDown(wide: DataFrame, hierarchy: Hierarchy, measures: Seq[Column],
      depth: Int): DataFrame = {
    val levels = hierarchy.levels.take(depth)
    // grouping_id() is only resolvable inside the rollup's own agg list
    // (not a downstream projection); its bitmask has the first rollup
    // column as the most significant bit — exactly the level mask.
    val aggs = measures :+ grouping_id().cast("long").as("level_mask")
    wide.rollup(levels.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Cross-hierarchy cube (every subtotal combination). */
  def cube2(wide: DataFrame, a: String, b: String, measures: Seq[Column]): DataFrame = {
    val aggs = measures :+ grouping_id().cast("long").as("level_mask")
    wide.cube(col(a), col(b)).agg(aggs.head, aggs.tail: _*)
  }

  /** The two reference measures (`Schema_Trabajo_Final.xml:69-71,87-89`). */
  def countMovements(key: String): Column = count(col(key)).as("cantidad_movimientos")
  def avgAge(ageCol: String): Column = avg(col(ageCol)).as("promedio_edades")
}
