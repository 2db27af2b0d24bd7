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
  *  - slicers are pre-aggregation fact filters. On a routed side they
  *    are SERVED FROM STORED PARTIALS when the chosen table's grain
  *    carries every column the predicate references (filtering grain
  *    columns selects whole fact groups, so it commutes with the
  *    partial aggregation — Mondrian's sliced-MDX-from-agg-tables
  *    behavior, the same commute [[AggRoute]] applies to raw SQL);
  *    when no table covers grain ∪ slicer columns, the navigator's
  *    standard fact fallback answers, with the slicers applied
  *    pre-aggregation — correct, at fact cost.
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

  /** The declarative query, one of THREE mutually-exclusive faces:
    * `hierarchies` for a full member space (every level prefix + the
    * All member, q203's shape); `grain` for one slice — with
    * `drillAcross` sides merged at that grain (q219's shape); or
    * `sets` for an EXPLICIT list of member sets (an MDX set union,
    * a BI tool's ad-hoc cell selection) — computed in ONE
    * GROUPING SETS pass direct, or routed set-by-set to the smallest
    * covering aggregate table ([[AggNavigator.navigateSets]]), with
    * the [[Cube.memberSets]] `gid` cell-identity contract either way
    * (an empty inner list is the All member). `always` columns are
    * grouped in every member set (the multi-cube tag). */
  final case class Query(
      cube: CubeRef,
      hierarchies: Seq[Cube.Hierarchy] = Nil,
      grain: Seq[String] = Nil,
      slicers: Seq[Column] = Nil,
      always: Seq[String] = Nil,
      drillAcross: Seq[CubeRef] = Nil,
      derived: Seq[Column] = Nil,
      sets: Seq[Seq[String]] = Nil)

  /** Column names a slicer predicate references — read from the
    * expression tree (unresolved attributes from `col()`/wire
    * parses; resolved ones from a caller that bound a frame), never
    * hand-declared: routing a sliced query to stored partials is only
    * sound when the chosen table's grain carries EVERY one of these. */
  private def slicerRefs(slicers: Seq[Column]): Seq[String] =
    slicers.flatMap { c =>
      org.apache.spark.sql.graft.Bridge.catalystExpression(
        org.apache.spark.sql.SparkSession.active, c).collect {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          u.nameParts.last
        case a: org.apache.spark.sql.catalyst.expressions
            .AttributeReference => a.name
      }
    }.distinct

  /** Compile + run. Pure plan construction — every shape lowers to an
    * existing, separately-specced operator. */
  def run(q: Query): DataFrame = {
    val faces = Seq(q.hierarchies.nonEmpty, q.grain.nonEmpty,
      q.sets.nonEmpty).count(identity)
    require(faces == 1,
      "exactly one of hierarchies (member space), grain (drill), or " +
        "sets (explicit member sets) must be set")
    val sCols = slicerRefs(q.slicers)
    def sliced(ref: CubeRef): DataFrame =
      q.slicers.foldLeft(ref.fact())(_.filter(_))
    if (q.sets.nonEmpty) {
      require(q.drillAcross.isEmpty,
        "drill-across needs a conformed grain — explicit member sets " +
          "are single-cube")
      require(q.derived.isEmpty,
        "derived measures are a drill-across feature")
      // SET semantics across the union too: two requests for the same
      // grain (a literal duplicate from the wire, or two hierarchies
      // whose prefixes expand to the same columns in MDX) are ONE
      // member set — duplicates would emit every cell twice under the
      // SAME gid, breaking the (levels, gid) cell-identity contract
      // a set's identity is its COLUMN SET (order inside a set
      // affects neither the grouping nor the gid, whose bits follow
      // allLevels positions), so [y,m] and [m,y] are one set too
      val withAlways = q.sets.map(s => (q.always ++ s).distinct)
        .distinctBy(_.toSet)
      val allLevels = withAlways.flatten.distinct
      q.cube.registry match {
        case Some(reg) =>
          AggNavigator.navigateSets(reg, q.cube.fact(), allLevels,
            withAlways, q.slicers, sCols)
        case None =>
          // one Expand + partial/final aggregate over exactly the
          // requested sets — the memberSets plan restricted to a
          // subset; grouping_id's bit order (allLevels, msb first)
          // matches navigateSets' literal gids, so routed and direct
          // answers stay cell-identical
          val aggs = q.cube.measures :+ grouping_id().cast("long").as("gid")
          sliced(q.cube)
            .groupingSets(withAlways.map(_.map(col)), allLevels.map(col): _*)
            .agg(aggs.head, aggs.tail: _*)
      }
    } else if (q.hierarchies.nonEmpty) {
      require(q.drillAcross.isEmpty,
        "drill-across needs a conformed grain — member spaces are " +
          "single-cube (use `always` for a cube tag)")
      require(q.derived.isEmpty,
        "derived measures are a drill-across feature")
      q.cube.registry match {
        case Some(reg) =>
          val prefixes: Seq[Seq[String]] =
            Seq.empty[String] +: q.hierarchies.flatMap(h =>
              (1 to h.levels.size).map(h.levels.take(_)))
          val allLevels =
            (q.always ++ q.hierarchies.flatMap(_.levels)).distinct
          AggNavigator.navigateSets(reg, q.cube.fact(), allLevels,
            prefixes.map(p => q.always ++ p), q.slicers, sCols)
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
            AggNavigator.navigate(reg, side.fact(), q.grain,
              q.slicers, sCols)
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
    *   "grain": ["y","m"],                                     // OR
    *   "sets": [[], ["y"], ["y","m"]],   // explicit member sets
    *                                     // ([] = the All member)
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
    * and derived expressions parse with Spark's own SQL parser but
    * are GATED through [[DefaultWireFunctions]] first — an untrusted
    * client gets query shaping, not `reflect()`-style code execution
    * (see the allowlist's scaladoc for the trust model and opt-outs). */
  private val WireFields = Set("cube", "hierarchies", "grain", "slicers",
    "always", "drillAcross", "derived", "measures", "sets")

  /** Functions a WIRE expression may call. The wire parses slicer /
    * measure / derived strings with Spark's FULL expression language,
    * which includes `reflect`/`java_method` — arbitrary JVM calls. A
    * trusted Scala caller already has that power; an untrusted
    * NON-Scala client (the wire's whole audience) must not get code
    * execution from a query document, so every wire expression is
    * gated through this allowlist BEFORE `expr()`: aggregates,
    * arithmetic/comparison/case/cast (plain syntax nodes — always
    * allowed), date/string/math scalars. Deliberately absent:
    * reflection, shell/url/file readers, nondeterministic functions
    * (`rand`, `uuid` — a cube query must be replayable), and
    * subqueries (rejected structurally). Extend per deployment via
    * `fromJson`'s `allowedFunctions`, or pass [[UnrestrictedWire]]
    * for a client as trusted as Scala code. */
  val DefaultWireFunctions: Set[String] = Set(
    // aggregates
    "count", "count_if", "sum", "avg", "mean", "min", "max", "first",
    "last", "any_value", "stddev", "stddev_samp", "stddev_pop",
    "variance", "var_samp", "var_pop", "skewness", "kurtosis", "corr",
    "covar_samp", "covar_pop", "approx_count_distinct", "median",
    "percentile", "percentile_approx", "mode", "sum_distinct",
    "count_distinct", "grouping", "grouping_id",
    // conditionals / null handling
    "coalesce", "nullif", "nvl", "nvl2", "ifnull", "if", "isnull",
    "isnotnull", "greatest", "least", "nanvl",
    // math
    "round", "bround", "floor", "ceil", "ceiling", "abs", "sign",
    "signum", "sqrt", "cbrt", "exp", "ln", "log", "log2", "log10",
    "pow", "power", "mod", "pmod", "try_divide", "try_add",
    "try_subtract", "try_multiply",
    // date/time
    "year", "quarter", "month", "day", "dayofmonth", "dayofweek",
    "dayofyear", "weekofyear", "hour", "minute", "second",
    "date_trunc", "trunc", "to_date", "to_timestamp", "date_add",
    "date_sub", "datediff", "date_diff", "months_between",
    "add_months", "last_day", "next_day", "date_format", "make_date",
    "unix_timestamp", "from_unixtime", "extract", "date_part",
    // string
    "concat", "concat_ws", "format_string", "format_number", "lower",
    "upper", "initcap", "trim", "ltrim", "rtrim", "lpad", "rpad",
    "substring", "substr", "left", "right", "length", "char_length",
    "character_length", "instr", "locate", "position", "replace",
    "translate", "split", "split_part", "regexp_extract",
    "regexp_replace", "regexp_like", "rlike", "like", "ilike",
    "contains", "startswith", "endswith", "repeat", "reverse",
    // deterministic hashing (bucketing/sampling predicates)
    "hash", "xxhash64", "crc32", "md5", "sha1", "sha2")

  /** Sentinel: skip the wire-function gate entirely — for clients
    * trusted with the full expression language (equivalent to calling
    * the Scala API directly). */
  val UnrestrictedWire: Set[String] = Set("*")

  /** Parse a wire expression, reject calls outside `allowed` (and any
    * embedded subquery), and return a Column built from THE VALIDATED
    * TREE itself — not a re-parse. Re-parsing through `expr()` would
    * hand the string to the active session's parser, which
    * `SparkSessionExtensions` can replace: the gate would then have
    * validated a different tree than the one that runs (a macro-
    * expanding custom parser could smuggle `reflect` past it), and
    * every expression would be parsed twice besides. Under
    * [[UnrestrictedWire]] the session parser IS the contract (the
    * client is trusted with the session's full surface), so that path
    * alone uses `expr()`. */
  private[olap] def safeWireExpr(s: String, where: String,
      allowed: Set[String]): Column = {
    if (allowed.contains("*")) return expr(s)
    val parsed =
      try org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(s)
      catch {
        case e: org.apache.spark.sql.catalyst.parser.ParseException =>
          throw new IllegalArgumentException(
            s"'$where' failed to parse: ${e.getMessage}")
      }
    val badCalls = parsed.collect {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if !allowed.contains(f.nameParts.last.toLowerCase(
            java.util.Locale.ROOT)) =>
        f.nameParts.mkString(".")
    }.distinct.sorted
    require(badCalls.isEmpty,
      s"'$where' calls function(s) ${badCalls.mkString("'", "', '", "'")} " +
        "outside the wire allowlist — extend fromJson's " +
        "allowedFunctions, or pass CubeQuery.UnrestrictedWire for a " +
        "fully-trusted client")
    require(!parsed.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions
        .SubqueryExpression]),
      s"'$where' embeds a subquery — wire expressions are " +
        "scalar/aggregate only")
    org.apache.spark.sql.graft.Bridge.column(parsed)
  }

  def fromJson(json: String, catalog: Map[String, CubeRef],
      allowedFunctions: Set[String] = DefaultWireFunctions): Query = {
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
            val s = str(m \ "expr", s"measures.$cube[$i].expr")
            safeWireExpr(s, s"measures.$cube[$i].expr", allowedFunctions)
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
        val s = str(d \ "expr", s"derived[$i].expr")
        safeWireExpr(s, s"derived[$i].expr", allowedFunctions)
          .as(str(d \ "as", s"derived[$i].as"))
      }
      case JNothing | JNull => Nil
      case _ => throw new IllegalArgumentException(
        "'derived' must be an array of {expr, as}")
    }
    val sets = j \ "sets" match {
      case JArray(xs) => xs.zipWithIndex.map {
        case (JArray(ss), i) => ss.zipWithIndex.map { case (v, k) =>
          str(v, s"sets[$i][$k]") }
        case (_, i) => throw new IllegalArgumentException(
          s"'sets[$i]' must be a string array (one member set; empty " +
            "= the All member)")
      }
      case JNothing | JNull => Nil
      case _ => throw new IllegalArgumentException(
        "'sets' must be an array of string arrays (one per member set)")
    }
    Query(
      cube = ref(cubeName),
      hierarchies = hierarchies,
      grain = strs("grain"),
      sets = sets,
      slicers = strs("slicers").zipWithIndex.map { case (s, i) =>
        safeWireExpr(s, s"slicers[$i]", allowedFunctions)
      },
      always = strs("always"),
      drillAcross = strs("drillAcross").map(ref),
      derived = derived)
  }

  /** Parse-and-run convenience for wire clients. */
  def runJson(json: String, catalog: Map[String, CubeRef],
      allowedFunctions: Set[String] = DefaultWireFunctions): DataFrame =
    run(fromJson(json, catalog, allowedFunctions))

  /** The SQL face (the reference's Grafana→Postgres entry point,
    * `docker-compose.yaml:20-47`): compile the query and register it
    * as a session temp view, so any SQL client of this session —
    * `spark.sql`, the Thrift/Connect server a BI tool dials — selects
    * from it by NAME with plain ANSI SQL (filter on `gid` to pick a
    * member set, project measures, ORDER BY). The registration is a
    * PLAN, not a materialization: each SQL query re-executes it, so
    * for serving workloads register a ROUTED query (registry-backed)
    * — its plan reads dim-sized aggregate tables with zero fact
    * lineage per hit, which is the shape Grafana polling wants; a
    * direct member space re-aggregates the fact per query and is only
    * right for ad-hoc exploration. */
  def registerSql(spark: org.apache.spark.sql.SparkSession, name: String,
      q: Query): Unit =
    run(q).createOrReplaceTempView(name)
}
