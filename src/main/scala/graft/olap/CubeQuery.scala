package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative cube-query front door — the one entry point a
  * non-Scala client (an MDX bridge, a JSON API, a BI tool adapter)
  * drives: a [[Query]] names the cube, the hierarchy level-prefixes
  * OR an explicit grain, the slicers, and optional drill-across
  * sides, and [[run]] COMPILES it onto the existing engine plans —
  * [[Cube.memberSets]] / [[AggNavigator.navigateSets]] for member
  * spaces, [[AggNavigator.navigate]] / a grain aggregate for a single
  * drill, and [[DrillAcross]]'s conformed merge for cross-cube
  * queries. The reference exposes exactly this shape twice — Mondrian
  * compiles MDX over `Schema_Trabajo_Final.xml:2-91`'s cube
  * declarations, Grafana sends SQL — while the engine's own surface
  * was method calls; this closes the declarative gap WITHOUT new
  * execution machinery: every query here lowers to a plan another
  * test already pins (the spec asserts hash-identity with the direct
  * calls and zero fact lineage when a registry covers).
  *
  * Routing rules, stated where a client hits them:
  *  - a [[CubeRef]] is DIRECT (fact + measure columns) or ROUTED (an
  *    [[AggNavigator.Registry]] whose measures serve). A routed side
  *    never constructs its fact lineage when a registered aggregate
  *    covers the requested grain.
  *  - slicers are pre-aggregation fact filters; they are REJECTED on
  *    routed sides — stored partials are built over the unfiltered
  *    fact, so serving a sliced query from them would be silently
  *    wrong (register a filtered rollup, or go direct).
  *  - `hierarchies` (member space) and `grain` (single-grain drill)
  *    are mutually exclusive; drill-across sides require a grain
  *    (Kimball's conformed-grain contract).
  */
object CubeQuery {

  /** One cube side: a fact thunk (never forced when a registry
    * covers), plus EITHER direct measure columns OR a registry. */
  final case class CubeRef(fact: () => DataFrame,
      measures: Seq[Column] = Nil,
      registry: Option[AggNavigator.Registry] = None) {
    require(registry.isEmpty || measures.isEmpty,
      "a routed CubeRef serves its registry's measures — direct " +
        "measure columns would silently diverge from the stored partials")
    require(registry.nonEmpty || measures.nonEmpty,
      "a CubeRef needs direct measures or a registry")
  }

  /** The declarative query: `hierarchies` for a member space (every
    * level prefix + the All member, q203's shape), or `grain` for one
    * slice — with `drillAcross` sides merged at that grain (q219's
    * shape). `always` columns are grouped in every member set (the
    * multi-cube tag). */
  final case class Query(
      cube: CubeRef,
      hierarchies: Seq[Cube.Hierarchy] = Nil,
      grain: Seq[String] = Nil,
      slicers: Seq[Column] = Nil,
      always: Seq[String] = Nil,
      drillAcross: Seq[CubeRef] = Nil,
      derived: Seq[Column] = Nil)

  /** Compile + run. Pure plan construction — every shape lowers to an
    * existing, separately-specced operator. */
  def run(q: Query): DataFrame = {
    require(q.hierarchies.nonEmpty ^ q.grain.nonEmpty,
      "exactly one of hierarchies (member space) or grain (drill) " +
        "must be set")
    def sliced(ref: CubeRef): DataFrame =
      q.slicers.foldLeft(ref.fact())(_.filter(_))
    if (q.hierarchies.nonEmpty) {
      require(q.drillAcross.isEmpty,
        "drill-across needs a conformed grain — member spaces are " +
          "single-cube (use `always` for a cube tag)")
      require(q.derived.isEmpty,
        "derived measures are a drill-across feature")
      q.cube.registry match {
        case Some(reg) =>
          require(q.slicers.isEmpty,
            "slicers cannot be served from stored partials — register " +
              "a filtered rollup or query the cube directly")
          val prefixes: Seq[Seq[String]] =
            Seq.empty[String] +: q.hierarchies.flatMap(h =>
              (1 to h.levels.size).map(h.levels.take(_)))
          val allLevels =
            (q.always ++ q.hierarchies.flatMap(_.levels)).distinct
          AggNavigator.navigateSets(reg, q.cube.fact(), allLevels,
            prefixes.map(p => q.always ++ p))
        case None =>
          Cube.memberSets(sliced(q.cube), q.hierarchies, q.cube.measures,
            q.always)
      }
    } else {
      require(q.always.isEmpty,
        "`always` is a member-space feature — fold the column into " +
          "`grain` for a drill")
      val sides = q.cube +: q.drillAcross
      val grouped = sides.map { side =>
        side.registry match {
          case Some(reg) =>
            require(q.slicers.isEmpty,
              "slicers cannot be served from stored partials — register " +
                "a filtered rollup or query the cube directly")
            AggNavigator.navigate(reg, side.fact(), q.grain)
          case None =>
            sliced(side).groupBy(q.grain.map(col): _*)
              .agg(side.measures.head, side.measures.tail: _*)
        }
      }
      if (sides.size == 1) {
        val g = grouped.head
        if (q.derived.isEmpty) g
        else g.select(g.columns.map(col).toIndexedSeq ++ q.derived: _*)
      } else DrillAcross.mergeConformed(grouped, q.grain, q.derived)
    }
  }

  /** JSON binding — the wire format a NON-SCALA client actually
    * sends (Mondrian's split made explicit: the catalog is the schema
    * file — cubes, facts, registries, measure definitions live in
    * code/config — and the JSON is the query). Shape:
    *
    * {{{
    * { "cube": "orders",
    *   "hierarchies": [{"name":"fecha","levels":["y","m"]}],   // OR
    *   "grain": ["y","m"],
    *   "slicers": ["y >= 1996"],                 // SQL boolean exprs
    *   "always": ["fact"],
    *   "drillAcross": ["shipments"],             // catalog names
    *   "derived": [{"as":"net","expr":"coalesce(s,0.0)-coalesce(p,0.0)"}],
    *   "measures": {"orders": [{"as":"n","expr":"count(1)"}]} }
    * }}}
    *
    * `measures` optionally OVERRIDES a DIRECT catalog cube's measure
    * list with SQL aggregate expressions (aliases required — the
    * conformed merge and the oracle compare are name-keyed); a routed
    * cube's measures are its registry's stored partials and cannot be
    * overridden from the wire (rejected loudly — the override would
    * silently diverge from what the aggregate tables hold). Slicer
    * and derived expressions parse with Spark's own SQL parser, so
    * the wire surface is exactly the engine's expression language. */
  private val WireFields = Set("cube", "hierarchies", "grain", "slicers",
    "always", "drillAcross", "derived", "measures")

  def fromJson(json: String, catalog: Map[String, CubeRef]): Query = {
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(json)
    // unknown top-level keys are REJECTED, not dropped: a client typo
    // ("slicer" for "slicers") silently running the query unfiltered
    // is the worst wire failure mode — wrong data with no error
    j match {
      case JObject(fields) =>
        val unknown = fields.map(_._1).filterNot(WireFields)
        require(unknown.isEmpty,
          s"unknown field(s) ${unknown.sorted.mkString("'", "', '", "'")} — " +
            s"the wire accepts: ${WireFields.toSeq.sorted.mkString(", ")}")
      case _ => throw new IllegalArgumentException(
        "the query must be a JSON object")
    }
    // named extraction: a missing/mistyped sub-field must surface as
    // the same IllegalArgumentException contract as every other wire
    // error, never a raw json4s MappingException
    def str(v: JValue, where: String): String = v match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException(
        s"'$where' must be a string (got ${v.getClass.getSimpleName})")
    }
    def strs(field: String): Seq[String] = j \ field match {
      case JArray(xs) => xs.zipWithIndex.map { case (x, i) =>
        str(x, s"$field[$i]") }
      case JNothing | JNull => Nil
      case _ => throw new IllegalArgumentException(
        s"'$field' must be an array of strings")
    }
    val overrides: Map[String, Seq[Column]] = j \ "measures" match {
      case JObject(fields) => fields.map { case (cube, arr) =>
        val ms = arr match {
          case JArray(xs) => xs.zipWithIndex.map { case (m, i) =>
            expr(str(m \ "expr", s"measures.$cube[$i].expr"))
              .as(str(m \ "as", s"measures.$cube[$i].as"))
          }
          case _ => throw new IllegalArgumentException(
            s"'measures.$cube' must be an array of {expr, as}")
        }
        cube -> ms
      }.toMap
      case JNothing | JNull => Map.empty
      case _ => throw new IllegalArgumentException(
        "'measures' must be an object of cube -> [{expr, as}]")
    }
    def ref(name: String): CubeRef = {
      val base = catalog.getOrElse(name, throw new IllegalArgumentException(
        s"cube '$name' is not in the catalog " +
          s"(available: ${catalog.keys.toSeq.sorted.mkString(", ")})"))
      overrides.get(name) match {
        case None => base
        case Some(ms) =>
          require(base.registry.isEmpty,
            s"cube '$name' is ROUTED — its measures are the registry's " +
              "stored partials and cannot be overridden from the wire")
          CubeRef(base.fact, measures = ms)
      }
    }
    val cubeName = j \ "cube" match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException(
        "'cube' (a catalog name) is required")
    }
    val sideNames = cubeName +: strs("drillAcross")
    // an override keyed on a cube this query never touches is a typo
    // (case slip, stale name) that would otherwise silently serve the
    // catalog's DEFAULT measures instead of the requested ones
    val unusedOverrides = overrides.keySet -- sideNames.toSet
    require(unusedOverrides.isEmpty,
      s"measure overrides for cube(s) ${unusedOverrides.toSeq.sorted
        .mkString("'", "', '", "'")} that this query does not reference " +
        s"(sides: ${sideNames.mkString(", ")})")
    val hierarchies = j \ "hierarchies" match {
      case JArray(xs) => xs.zipWithIndex.map { case (h, i) =>
        Cube.Hierarchy(str(h \ "name", s"hierarchies[$i].name"),
          h \ "levels" match {
            case JArray(ls) => ls.zipWithIndex.map { case (l, k) =>
              str(l, s"hierarchies[$i].levels[$k]") }
            case _ => throw new IllegalArgumentException(
              s"'hierarchies[$i].levels' must be a string array")
          })
      }
      case JNothing | JNull => Nil
      case _ => throw new IllegalArgumentException(
        "'hierarchies' must be an array of {name, levels}")
    }
    val derived = j \ "derived" match {
      case JArray(xs) => xs.zipWithIndex.map { case (d, i) =>
        expr(str(d \ "expr", s"derived[$i].expr"))
          .as(str(d \ "as", s"derived[$i].as"))
      }
      case JNothing | JNull => Nil
      case _ => throw new IllegalArgumentException(
        "'derived' must be an array of {expr, as}")
    }
    Query(
      cube = ref(cubeName),
      hierarchies = hierarchies,
      grain = strs("grain"),
      slicers = strs("slicers").map(expr),
      always = strs("always"),
      drillAcross = strs("drillAcross").map(ref),
      derived = derived)
  }

  /** Parse-and-run convenience for wire clients. */
  def runJson(json: String, catalog: Map[String, CubeRef]): DataFrame =
    run(fromJson(json, catalog))
}
