package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A minimal MDX front end over [[CubeQuery]] — the TEXT-language
  * face the reference's users actually type: Mondrian compiles MDX
  * against the cube declarations of `Schema_Trabajo_Final.xml:2-91`
  * (hierarchies fecha/frontera/transporte/…, measures
  * cantidad_movimientos/promedio_edades). [[CubeQuery.fromJson]]
  * (r15) closed the wire for programmatic clients; this closes the
  * human/BI-tool side for the drill shape. NO new execution
  * machinery: an MDX statement parses into a [[CubeQuery.Query]] and
  * lowers through the same routed/direct plans every cube test pins —
  * a registry-backed cube answers an MDX drill with zero fact lineage
  * exactly like its JSON twin (spec-asserted).
  *
  * The SUBSET, stated precisely (everything else is rejected loudly,
  * never mis-served):
  *
  * {{{
  * ( WITH ( MEMBER [Measures].[alias] AS '<expr>' )+ )?
  * SELECT { [Measures].[alias] (, [Measures].[alias])* } ON COLUMNS,
  *        <rowset> ON ROWS
  * FROM [cube]
  * ( WHERE ( [Hier].[level].[value] (, [Hier].[level].[value])* ) )?
  *
  * <rowset> := { [Hier].[level].Members (, [Hier].[level].Members)* }
  *           | CROSSJOIN( <rowset>, <rowset> )
  * }}}
  *
  *  - `[Hier].[level].Members` groups by the hierarchy's level PREFIX
  *    down to `level` (member identity in a hierarchy includes its
  *    ancestors — `[fecha].[mes_movi].Members` is per (anio, mes),
  *    which is exactly what Mondrian's generated SQL groups by for a
  *    snowflaked level).
  *  - a ROWS axis of ONE set is a drill ([[CubeQuery.Query]]'s
  *    `grain`); a set UNION (`{a.Members, b.Members}`) is several
  *    member sets, lowered to the `sets` face — ONE GROUPING SETS
  *    pass direct, or per-set aggregate-table routing when the cube
  *    carries a registry — with the [[Cube.memberSets]] `gid` column
  *    riding in the output as the cell identity. CROSSJOIN
  *    distributes over unions the MDX way: each operand's sets pair
  *    off into concatenated grains.
  *  - the COLUMNS axis names a SUBSET of the cube's measures by
  *    output alias — selection happens on the aggregated result, so
  *    routed cubes keep serving stored partials untouched.
  *  - `WITH MEMBER [Measures].[x] AS '<expr>'` declares a CALCULATED
  *    member: a post-aggregation projection over the cube's measure
  *    aliases, applied AFTER the aggregate (so it works identically
  *    on direct, routed, drill and set-union queries — a ratio of
  *    stored partials never touches the fact). The expression is
  *    SQL, with `[Measures].[alias]` references rewritten to the
  *    alias first so MDX-style text reads naturally; it is GATED
  *    through the same function allowlist as the JSON wire
  *    ([[CubeQuery.DefaultWireFunctions]]) — MDX arrives as untrusted
  *    text, and a calculated member must shape cells, not execute
  *    code. Calculated members are selectable on COLUMNS like any
  *    measure; names must not collide with existing columns.
  *  - the WHERE tuple is a slicer: equality on the named level's
  *    column, applied pre-aggregation (and therefore rejected on
  *    routed cubes by [[CubeQuery.run]]'s stored-partials rule). The
  *    value types by the CUBE COLUMN — cast to its type, with a named
  *    error when a numeric column gets a non-numeric value — never by
  *    the value's shape (an all-digits literal against a string level
  *    stays a string: '7' and '007' are distinct members).
  *
  * Axes may appear in either order; keywords are case-insensitive;
  * axis numbers (`ON 0`/`ON 1`) are not supported.
  *
  * The CATALOG split mirrors Mondrian's: `catalog` maps cube names to
  * fact/measure/registry bindings (the schema file's role, lives in
  * code) and `schema` declares each cube's hierarchies — the MDX
  * document is only ever the QUERY. */
object Mdx {

  /** One `[Hier].[level].[value]` slicer member. */
  final case class Member(hierarchy: String, level: String, value: String)

  /** The parsed statement, pre-validation: calculated members
    * (alias → SQL-ish expression text), measures by alias, the ROWS
    * axis as a UNION of sets — each set a crossjoined list of
    * (hierarchy, level) pairs — and slicer members. A single-element
    * union is a plain drill. */
  final case class Parsed(cube: String, calc: Seq[(String, String)],
      measures: Seq[String], rows: Seq[Seq[(String, String)]],
      slicers: Seq[Member])

  /** `[Measures].[alias]` references inside a calculated member's
    * expression, rewritten to the bare alias before SQL parsing. */
  private val MeasureRefRe = """\[Measures\]\.\[([^\]]+)\]""".r

  /** Parse + compile + run + select the requested measures (plus the
    * `gid` cell identity when the ROWS axis is a set union).
    * Calculated-member expressions are gated through
    * `allowedFunctions` exactly like JSON-wire expressions. */
  def run(mdx: String, catalog: Map[String, CubeQuery.CubeRef],
      schema: Map[String, Seq[Cube.Hierarchy]],
      allowedFunctions: Set[String] = CubeQuery.DefaultWireFunctions)
      : DataFrame = {
    val p = parse(mdx)
    val q = toQuery(p, catalog, schema)
    val agg = CubeQuery.run(q)
    val out = p.calc.foldLeft(agg) { case (df, (alias, exprText)) =>
      require(!df.columns.contains(alias),
        s"calculated member [$alias] collides with an existing " +
          s"column of cube '${p.cube}'")
      val sql = MeasureRefRe.replaceAllIn(exprText,
        m => scala.util.matching.Regex.quoteReplacement(m.group(1)))
      df.withColumn(alias,
        CubeQuery.safeWireExpr(sql, s"calculated member [$alias]",
          allowedFunctions))
    }
    val keyCols =
      if (q.sets.nonEmpty) q.sets.flatten.distinct :+ "gid" else q.grain
    val missing = p.measures.filterNot(out.columns.contains)
    require(missing.isEmpty,
      s"measure(s) ${missing.mkString("[", "], [", "]")} are not " +
        s"produced by cube '${p.cube}' (available: " +
        s"${out.columns.filterNot(keyCols.contains).mkString(", ")})")
    out.select((keyCols ++ p.measures).map(col): _*)
  }

  /** Compile a [[Parsed]] statement onto the declarative front door,
    * validating every hierarchy/level against the cube's schema. */
  def toQuery(p: Parsed, catalog: Map[String, CubeQuery.CubeRef],
      schema: Map[String, Seq[Cube.Hierarchy]]): CubeQuery.Query = {
    val ref = catalog.getOrElse(p.cube, throw new IllegalArgumentException(
      s"cube '[${p.cube}]' is not in the catalog (available: " +
        s"${catalog.keys.toSeq.sorted.mkString(", ")})"))
    val hiers = schema.getOrElse(p.cube, throw new IllegalArgumentException(
      s"cube '[${p.cube}]' has no hierarchy schema (declared: " +
        s"${schema.keys.toSeq.sorted.mkString(", ")})"))
    val byName = hiers.map(h => h.name -> h).toMap
    def resolve(hn: String, lvl: String): Cube.Hierarchy = {
      val h = byName.getOrElse(hn, throw new IllegalArgumentException(
        s"hierarchy '[$hn]' is not declared for cube '${p.cube}' " +
          s"(declared: ${hiers.map(_.name).mkString(", ")})"))
      require(h.levels.contains(lvl),
        s"level '[$lvl]' is not in hierarchy '[$hn]' (levels: " +
          s"${h.levels.mkString(", ")})")
      h
    }
    // each (hierarchy, level) expands to its level PREFIX; a
    // single-set ROWS axis is a drill (grain), a union is the
    // explicit-sets face with its per-set grains
    val expanded: Seq[Seq[String]] = p.rows.map(_.flatMap {
      case (hn, lvl) =>
        val h = resolve(hn, lvl)
        h.levels.take(h.levels.indexOf(lvl) + 1)
    }.distinct)
    require(expanded.nonEmpty && expanded.forall(_.nonEmpty),
      "the ROWS axis produced an empty grain")
    val (grain, sets) =
      if (expanded.size == 1) (expanded.head, Nil)
      else (Nil, expanded)
    // slicers on a ROUTED cube can never be served (stored partials
    // are built over the unfiltered fact) — CubeQuery.run rejects
    // them too, but failing HERE keeps the rejection from first
    // constructing the fact lineage just to read a schema it never
    // uses
    require(ref.registry.isEmpty || p.slicers.isEmpty,
      "slicers cannot be served from stored partials — register a " +
        "filtered rollup or query the cube directly")
    // memoize the fact thunk: the slicer typing below reads its
    // schema and CubeQuery.run forces it again — unmemoized, every
    // sliced MDX query would build the (possibly warehouse-sized)
    // fact plan twice on the driver
    val memoRef = { lazy val df = ref.fact(); ref.copy(fact = () => df) }
    // slicer values type by the CUBE COLUMN, not by the value's shape:
    // guessing "all digits → number" would CAST a string-typed level
    // for the comparison and conflate distinct members ('7' vs '007')
    // — silent mis-service. The literal is cast to the column's own
    // type instead (plan-only schema read; the fact thunk is forced
    // only when slicers exist, so routed zero-lineage drills stay
    // lineage-free), and the SAME legacy-mode Cast the comparison
    // will run is evaluated driver-side first: any value it would
    // silently null out — out-of-range integers, malformed dates,
    // non-numeric decimals, garbled booleans — is a NAMED error here
    // instead of a silently empty drill.
    val slicers =
      if (p.slicers.isEmpty) Nil
      else {
        val fact = memoRef.fact()
        // the session's resolution rules, not bare string equality —
        // under default case-insensitive resolution a level declared
        // 'Anio' must find column 'anio' exactly as col() would
        val resolver = fact.sparkSession.sessionState.analyzer.resolver
        val tz = fact.sparkSession.sessionState.conf.sessionLocalTimeZone
        p.slicers.map { m =>
          resolve(m.hierarchy, m.level): Unit
          val field = fact.schema.find(f => resolver(f.name, m.level))
            .getOrElse(throw new IllegalArgumentException(
              s"slicer level '[${m.level}]' is not a column of cube " +
                s"'${p.cube}' (columns: " +
                s"${fact.schema.fieldNames.mkString(", ")})"))
          val casted = org.apache.spark.sql.catalyst.expressions.Cast(
            org.apache.spark.sql.catalyst.expressions.Literal(m.value),
            field.dataType, Option(tz),
            org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY)
          require(casted.eval(null) != null,
            s"slicer value '[${m.value}]' does not cast to " +
              s"${field.dataType.simpleString} for level '[${m.level}]'")
          col(field.name) === lit(m.value).cast(field.dataType)
        }
      }
    CubeQuery.Query(cube = memoRef, grain = grain, sets = sets,
      slicers = slicers)
  }

  // ------------------------------------------------------------------
  // lexer + recursive-descent parser
  // ------------------------------------------------------------------

  private sealed trait Tok
  private final case class TBracket(s: String) extends Tok // [x]
  private final case class TIdent(s: String) extends Tok // bare word
  private final case class TSym(c: Char) extends Tok // { } ( ) , .
  private final case class TStr(s: String) extends Tok // '...'

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '[') {
        val j = s.indexOf(']', i + 1)
        require(j >= 0, s"unterminated '[' at offset $i")
        out += TBracket(s.substring(i + 1, j)); i = j + 1
      } else if (c == '\'') {
        // calculated-member expression text; no escape sequences —
        // SQL string literals inside would need doubling, which the
        // gate's parser does not see anyway (wire exprs are over
        // measure aliases and numbers)
        val j = s.indexOf('\'', i + 1)
        require(j >= 0, s"unterminated quote at offset $i")
        out += TStr(s.substring(i + 1, j)); i = j + 1
      } else if ("{}(),.".indexOf(c.toInt) >= 0) {
        out += TSym(c); i += 1
      } else if (c.isLetter || c == '_') {
        var j = i
        while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
        out += TIdent(s.substring(i, j)); i = j
      } else throw new IllegalArgumentException(
        s"unexpected character '$c' at offset $i in MDX")
    }
    out.result()
  }

  /** Parse one statement of the documented subset. */
  def parse(mdx: String): Parsed = new Parser(tokenize(mdx)).statement()

  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0

    private def peek: Option[Tok] = toks.lift(pos)
    private def next(): Tok = {
      val t = toks.lift(pos).getOrElse(throw new IllegalArgumentException(
        "unexpected end of MDX statement"))
      pos += 1; t
    }
    private def keyword(kw: String): Unit = next() match {
      case TIdent(s) if s.equalsIgnoreCase(kw) => ()
      case t => throw new IllegalArgumentException(
        s"expected '$kw', found $t")
    }
    private def atKeyword(kw: String): Boolean = peek match {
      case Some(TIdent(s)) => s.equalsIgnoreCase(kw)
      case _ => false
    }
    private def sym(c: Char): Unit = next() match {
      case TSym(`c`) => ()
      case t => throw new IllegalArgumentException(
        s"expected '$c', found $t")
    }
    private def atSym(c: Char): Boolean = peek.contains(TSym(c))
    private def bracket(what: String): String = next() match {
      case TBracket(s) => s
      case t => throw new IllegalArgumentException(
        s"expected [$what], found $t")
    }

    def statement(): Parsed = {
      val calc =
        if (atKeyword("WITH")) { keyword("WITH"); withMembers() } else Nil
      val dupCalc = calc.groupBy(_._1).filter(_._2.size > 1).keys
      require(dupCalc.isEmpty,
        s"duplicate calculated member(s) ${dupCalc.toSeq.sorted
          .mkString("[", "], [", "]")}")
      keyword("SELECT")
      var measures: Option[Seq[String]] = None
      var rows: Option[Seq[Seq[(String, String)]]] = None
      var more = true
      while (more) {
        val set = rowSetOrMeasures()
        keyword("ON")
        next() match {
          case TIdent(a) if a.equalsIgnoreCase("COLUMNS") =>
            require(measures.isEmpty, "duplicate COLUMNS axis")
            measures = Some(set match {
              case Left(ms) => ms
              case Right(_) => throw new IllegalArgumentException(
                "the COLUMNS axis must be a set of [Measures].[alias]")
            })
          case TIdent(a) if a.equalsIgnoreCase("ROWS") =>
            require(rows.isEmpty, "duplicate ROWS axis")
            rows = Some(set match {
              case Right(ls) => ls
              case Left(_) => throw new IllegalArgumentException(
                "the ROWS axis must be level sets " +
                  "([Hier].[level].Members / CROSSJOIN), not measures")
            })
          case t => throw new IllegalArgumentException(
            s"expected COLUMNS or ROWS, found $t")
        }
        if (atSym(',')) { sym(',') } else more = false
      }
      keyword("FROM")
      val cube = next() match {
        case TBracket(s) => s
        case TIdent(s) => s
        case t => throw new IllegalArgumentException(
          s"expected the cube name after FROM, found $t")
      }
      val slicers =
        if (atKeyword("WHERE")) { keyword("WHERE"); tuple() } else Nil
      peek.foreach(t => throw new IllegalArgumentException(
        s"trailing content after the statement: $t"))
      Parsed(cube, calc,
        measures.getOrElse(throw new IllegalArgumentException(
          "missing COLUMNS axis (the measure list)")),
        rows.getOrElse(throw new IllegalArgumentException(
          "missing ROWS axis (the drill levels)")),
        slicers)
    }

    /** `MEMBER [Measures].[alias] AS '<expr>'`, one or more (MDX
      * separates WITH declarations by juxtaposition, not commas). */
    private def withMembers(): Seq[(String, String)] = {
      var acc = Vector.empty[(String, String)]
      while (atKeyword("MEMBER")) {
        keyword("MEMBER")
        val head = bracket("Measures")
        require(head.equalsIgnoreCase("Measures"),
          s"calculated members live in [Measures], found [$head]")
        sym('.')
        val alias = bracket("alias")
        keyword("AS")
        val e = next() match {
          case TStr(s) => s
          case t => throw new IllegalArgumentException(
            s"expected a quoted expression after AS, found $t")
        }
        acc = acc :+ (alias -> e)
      }
      require(acc.nonEmpty, "WITH requires at least one MEMBER declaration")
      acc
    }

    /** One axis set: Left(measure aliases) for a measure set,
      * Right(union of crossjoined (hier, level) tuples) for a ROWS
      * set. Which one it is falls out of the first path's head
      * ([Measures] or a hierarchy); mixing is rejected. A braced
      * list of level segments is a set UNION (one member set per
      * segment); CROSSJOIN distributes over its operands' unions
      * (MDX set algebra: every pairing becomes one concatenated
      * tuple). */
    private def rowSetOrMeasures()
        : Either[Seq[String], Seq[Seq[(String, String)]]] =
      if (atKeyword("CROSSJOIN")) Right(crossjoin())
      else {
        sym('{')
        val first = pathItem()
        var acc = Vector(first)
        while (atSym(',')) { sym(','); acc = acc :+ pathItem() }
        sym('}')
        val (measures, levels) = acc.partition(_.isLeft)
        if (measures.nonEmpty && levels.nonEmpty)
          throw new IllegalArgumentException(
            "a set cannot mix [Measures] members with hierarchy levels")
        if (measures.nonEmpty) Left(measures.collect { case Left(m) => m })
        else Right(levels.collect { case Right(l) => Seq(l) })
      }

    private def crossjoin(): Seq[Seq[(String, String)]] = {
      keyword("CROSSJOIN")
      sym('(')
      val a = rowsOnly()
      sym(',')
      val b = rowsOnly()
      sym(')')
      for (sa <- a; sb <- b) yield sa ++ sb
    }

    private def rowsOnly(): Seq[Seq[(String, String)]] =
      rowSetOrMeasures() match {
        case Right(ls) => ls
        case Left(_) => throw new IllegalArgumentException(
          "CROSSJOIN operands must be hierarchy level sets")
      }

    /** `[Measures].[alias]` → Left(alias);
      * `[Hier].[level].Members` → Right((hier, level)). */
    private def pathItem(): Either[String, (String, String)] = {
      val head = bracket("Measures] or [Hierarchy")
      sym('.')
      val second = bracket("alias] or [level")
      if (head.equalsIgnoreCase("Measures")) Left(second)
      else {
        sym('.')
        next() match {
          case TIdent(m) if m.equalsIgnoreCase("Members") =>
            Right((head, second))
          case t => throw new IllegalArgumentException(
            s"expected .Members after [$head].[$second] on an axis, " +
              s"found $t (member literals belong in the WHERE slicer)")
        }
      }
    }

    private def tuple(): Seq[Member] = {
      sym('(')
      var acc = Vector(member())
      while (atSym(',')) { sym(','); acc = acc :+ member() }
      sym(')')
      acc
    }

    private def member(): Member = {
      val h = bracket("Hierarchy")
      sym('.')
      val l = bracket("level")
      sym('.')
      val v = bracket("value")
      Member(h, l, v)
    }
  }
}
