package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions._

/** Optimizer rule: `normalize_string` is idempotent — collapse nested
  * applications (they arise naturally when a pre-normalized column is
  * fed through a cleaning chain that normalizes defensively, e.g.
  * `Cleaning.classify` over an already-normalized column). Each
  * collapsed node saves a full NFD decomposition + regex pass per row. */
object CollapseNormalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NormalizeString(inner @ NormalizeString(_)) => inner
    }
}

/** SparkSessionExtensions injector: registers graft's native
  * expressions as SQL functions so `spark.sql("SELECT
  * normalize_string(text) ...")` works anywhere the DataFrame API
  * does — plug in via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", "", name, usage, "", "", "",
      "", "", "", "built-in")

  private def one(name: String, usage: String)(f: Expression => Expression) =
    (FunctionIdentifier(name), info(name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects 1 argument")
        f(args.head)
      })

  /** Constant integer argument, range-checked — a silent
    * `Long.toInt` truncation would run the query with a huge wrong
    * parameter instead of erroring. */
  private def intArg(fn: String, e: Expression, name: String): Int = {
    require(e.foldable, s"$fn: $name must be a constant")
    e.eval() match {
      case i: Int => i
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case l: Long =>
        require(l >= Int.MinValue && l <= Int.MaxValue,
          s"$fn: $name out of Int range: $l")
        l.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $name must be an integer, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => CollapseNormalize)
    ext.injectOptimizerRule(_ => graft.plans.PruneExpandByFilter)
    ext.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
    ext.injectOptimizerRule(_ => graft.olap.AggRoute.Rewrite)
    ext.injectPlannerStrategy(_ => graft.plans.SkylineStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction(one("normalize_string",
      "lower + NFD accent strip + whitespace collapse + trim")(NormalizeString.apply))
    ext.injectFunction(one("simhash64",
      "64-bit SimHash over word tokens")(SimHashExpr))
    ext.injectFunction(one("rolling_hash",
      "polynomial rolling hash over word tokens")(RollingHashExpr))
    ext.injectFunction(
      (FunctionIdentifier("vec_dot"),
        info("vec_dot", "fused dot product over array<float|double>"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "vec_dot expects 2 arguments")
          DotProduct(args(0), args(1))
        }))
    ext.injectFunction(
      (FunctionIdentifier("bounded_topk"),
        info("bounded_topk", "bounded_topk(expr, k): k smallest values " +
          "ascending — a k-element heap per group at every aggregation stage"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "bounded_topk expects 2 arguments")
          BoundedTopKAgg(args(0), intArg("bounded_topk", args(1), "k"))
        }))
    ext.injectFunction(
      (FunctionIdentifier("freq_sketch"),
        info("freq_sketch", "freq_sketch(expr, capacity): Misra-Gries " +
          "frequent-items sketch — bounded mergeable counters; items with " +
          "frequency > N/(capacity+1) are guaranteed present"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "freq_sketch expects 2 arguments")
          FreqSketchAgg(args(0), intArg("freq_sketch", args(1), "capacity"))
        }))
    ext.injectFunction(
      (FunctionIdentifier("jaro_winkler"),
        info("jaro_winkler", "jaro_winkler(a, b): Jaro-Winkler similarity " +
          "in [0,1] — byte-level, DuckDB-parity semantics"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "jaro_winkler expects 2 arguments")
          JaroWinkler(args(0), args(1))
        }))
    ext.injectFunction(
      (FunctionIdentifier("minhash_sig"),
        info("minhash_sig", "minhash_sig(text, shingleWidth, k)"),
        (args: Seq[Expression]) => {
          require(args.length == 3, "minhash_sig expects 3 arguments")
          MinHashSigExpr(args(0),
            intArg("minhash_sig", args(1), "shingleWidth"),
            intArg("minhash_sig", args(2), "k"))
        }))
  }
}
