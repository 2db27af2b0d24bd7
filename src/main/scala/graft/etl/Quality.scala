package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the dbt-test /
  * Great-Expectations contract surface): each rule yields one summary
  * row `(check, violations, pass)`; a table's whole rule set runs in
  * as few passes as the rules allow.
  *
  * Scale shape: every ROW-LEVEL rule (not-null, accepted-values,
  * range) is a conditional sum, so ALL of them fuse into a single
  * scan + one tiny aggregate — adding a rule costs one more codegen'd
  * sum, not another pass. `Unique` adds a distinct-count (Catalyst
  * plans the mixed distinct/plain aggregate with one Expand — still
  * one shuffle of key-width rows); `RefersTo` is a broadcast anti-join
  * count per referenced dimension (dims are broadcast-sized by
  * star-schema contract). Nothing ever collects rows: violation
  * COUNTS summarize; use the predicates themselves to materialize
  * violating rows when debugging.
  *
  * Null semantics follow SQL constraints: `Accepted`/`InRange` pass
  * NULLs (that's `NotNull`'s job), `Unique` ignores rows with a NULL
  * key component, `RefersTo` ignores NULL foreign keys.
  */
object Quality {

  sealed trait Rule { def check: String }
  /** Column must have no NULLs. */
  final case class NotNull(column: String) extends Rule {
    val check = s"not_null($column)"
  }
  /** Non-null values must be in the accepted set. */
  final case class Accepted(column: String, values: Seq[String]) extends Rule {
    val check = s"accepted_values($column)"
  }
  /** Non-null values must lie in [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val check = s"in_range($column)"
  }
  /** Key tuple must be unique (rows with a NULL component exempt). */
  final case class Unique(columns: Seq[String]) extends Rule {
    val check = s"unique(${columns.mkString(",")})"
  }
  /** Foreign key must exist in `dim(dimCol)` (NULL FKs exempt). */
  final case class RefersTo(column: String, dim: DataFrame, dimCol: String)
      extends Rule {
    val check = s"refers_to($column)"
  }

  /** Run all rules; returns `(check, violations, pass)`, one row per
    * rule, in rule order. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val spark = df.sparkSession

    // every sum-shaped rule fuses into one aggregate pass; results are
    // keyed by RULE INDEX, not check string — two same-kind rules on
    // one column with different params (two InRange fences, say) share
    // a check label but must not collide
    val indexed = rules.zipWithIndex
    val fusedAggs = rules.flatMap {
      case NotNull(c) => Some(
        sum(when(col(c).isNull, 1L).otherwise(0L)))
      case Accepted(c, vs) => Some(
        sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L).otherwise(0L)))
      case InRange(c, lo, hi) => Some(
        sum(when(col(c).isNotNull &&
          (col(c) < lit(lo) || col(c) > lit(hi)), 1L).otherwise(0L)))
      case Unique(ks) =>
        val allSet = ks.map(col(_).isNotNull).reduce(_ && _)
        Some(count(when(allSet, lit(1))) -
          count_distinct(col(ks.head), ks.tail.map(col): _*))
      case _: RefersTo => None
    }
    val fusedIdx = indexed.collect {
      case (_: NotNull | _: Accepted | _: InRange | _: Unique, i) => i
    }
    val fusedRows: Seq[(Int, Long)] =
      if (fusedAggs.isEmpty) Seq.empty
      else {
        val named = fusedAggs.zipWithIndex.map { case (a, i) =>
          a.cast("long").as(s"v$i")
        }
        val row = df.agg(named.head, named.tail: _*).collect()(0)
        fusedIdx.zipWithIndex.map { case (ruleIdx, i) =>
          // empty input: sums are NULL → zero violations
          (ruleIdx, if (row.isNullAt(i)) 0L else row.getLong(i))
        }
      }

    val refRows: Seq[(Int, Long)] = indexed.collect {
      case (RefersTo(c, dim, dc), i) =>
        val dangling = df.filter(col(c).isNotNull)
          .join(broadcast(dim.select(col(dc).as(c)).distinct()),
            Seq(c), "left_anti")
          .count()
        (i, dangling)
    }

    val byIdx = (fusedRows ++ refRows).toMap
    import spark.implicits._
    indexed.map { case (r, i) => (r.check, byIdx(i), byIdx(i) == 0L) }
      .toDF("check", "violations", "pass")
  }
}
