package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-cleaning operators: value mapping, sentinel nulling, date
  * assembly. These mirror the reference's PDI cleanup steps
  * (`/root/reference/etl_final.ktr:2669-2746, 3147-3607`) but are
  * expressed as pure Catalyst expression trees — no UDFs — so they stay
  * inside whole-stage codegen and cost nothing extra at 100 TB.
  */
object Cleaning {

  /** In-place value mapping with pass-through for unmatched values —
    * PDI ValueMapper semantics with empty `non_match_default`
    * (`etl_final.ktr:2680-2732`): unmatched source values are KEPT, not
    * nulled. Implemented as a map literal + `element_at` + `coalesce`
    * (O(1) lookup, codegen'd) instead of a chained `when`, which would
    * be O(n) comparisons per row.
    */
  /** Sorted map literal shared by [[valueMap]] and [[unmappedValues]] —
    * one construction so the mapping and its unmapped side-channel can
    * never drift apart. */
  private def mapLit(mapping: Map[String, String]): Column =
    map(mapping.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  def valueMap(c: Column, mapping: Map[String, String]): Column =
    coalesce(element_at(mapLit(mapping), c), c)

  /** Map a sentinel value (e.g. `"sin especificar"`) to null — PDI
    * ValueMapper with empty target (`etl_final.ktr:3540-3548`). */
  def sentinelToNull(c: Column, sentinel: String): Column =
    when(c === sentinel, lit(null)).otherwise(c)

  /** Spanish month name → "1".."12", unmatched kept
    * (`etl_final.ktr:2684-2731`). */
  val spanishMonths: Map[String, String] = Map(
    "enero" -> "1", "febrero" -> "2", "marzo" -> "3", "abril" -> "4",
    "mayo" -> "5", "junio" -> "6", "julio" -> "7", "agosto" -> "8",
    "septiembre" -> "9", "octubre" -> "10", "noviembre" -> "11",
    "diciembre" -> "12")

  /** Month number (1-12) → Spanish month name (the inverse mapping, used
    * by the OLAP month labels). */
  val monthNamesEs: Map[String, String] = spanishMonths.map(_.swap)

  /** `fecha_completa = anio/mes/dia`, originals kept — PDI ConcatFields
    * with `removeSelectedFields=N` (`etl_final.ktr:2502-2599`). Null
    * parts render as EMPTY slots ("2020//7"), PDI's behavior — a bare
    * concat_ws would silently drop the slot and make a missing month
    * ("2020/7") indistinguishable from a missing day. */
  def concatDate(anio: Column, mes: Column, dia: Column): Column =
    concat(
      coalesce(anio.cast("string"), lit("")), lit("/"),
      coalesce(mes.cast("string"), lit("")), lit("/"),
      coalesce(dia.cast("string"), lit("")))

  /** Trim + lowercase — PDI StringOperations (`etl_final.ktr:3158-3170`). */
  def trimLower(c: Column): Column = lower(trim(c))

  /** Dictionary classification with normalized compare and pass-through
    * of unmapped values — the reference's occupation classifier
    * (`Datos/preprocessing.py:39-64, 209-301`): look the normalized value
    * up in a broadcast-sized dictionary; unmapped values pass through
    * unchanged (and can be collected separately via [[unmappedValues]]).
    */
  def classify(c: Column, dictionary: Map[String, String]): Column =
    valueMap(graft.functions.normalize_string(c), dictionary)

  /** Side-channel of values the dictionary did not cover — the
    * reference collects these into a set and reports them
    * (`preprocessing.py:325-327`). Distinct is a partial-aggregated
    * shuffle on the (small) unmatched domain only. */
  def unmappedValues(df: DataFrame, colName: String,
      dictionary: Map[String, String]): DataFrame = {
    val norm = graft.functions.normalize_string(col(colName))
    df.filter(element_at(mapLit(dictionary), norm).isNull && norm.isNotNull)
      .select(norm.as("unmapped")).distinct()
  }
}
