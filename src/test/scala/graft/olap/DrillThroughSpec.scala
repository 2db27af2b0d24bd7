package graft.olap

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drill-through: every member-space cell's drilled rows reconcile
  * with its aggregate count, the null-member vs rolled-up distinction
  * holds, and the predicate pushes to the parquet scan. */
class DrillThroughSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val fact = TestSpark.table("orders").select(
    col("o_orderkey"),
    year(col("o_orderdate")).as("y"),
    when(col("o_orderstatus") === "P", lit(null))
      .otherwise(col("o_orderstatus")).as("st"))

  private val levels = Seq("y", "st")

  test("every cell of the member space drills to exactly the rows its count claims") {
    val sets = Seq(Seq(col("y"), col("st")), Seq(col("y")), Seq.empty[org.apache.spark.sql.Column])
    val cells = fact.groupingSets(sets, col("y"), col("st"))
      .agg(count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))
      .collect()
    assert(cells.nonEmpty)
    // genuine null members must exist for the distinction to be tested
    assert(cells.exists(r => r.getLong(3) === 0L && r.isNullAt(1)),
      "fixture must produce a genuine null st member")
    cells.foreach { r =>
      val gid = r.getLong(3)
      val values = Map[String, Any]("y" -> r.get(0), "st" -> r.get(1))
      val drilled = Cube.drillThrough(fact, levels, gid, values).count()
      assert(drilled === r.getLong(2),
        s"cell gid=$gid values=$values drilled $drilled rows, aggregate says ${r.getLong(2)}")
    }
  }

  test("rolled-up vs genuine-null: same null value, different gid, different rows") {
    val nullMember = Cube.drillThrough(fact, levels, 0L,
      Map("y" -> 1995, "st" -> null)).count()
    val rolledUp = Cube.drillThrough(fact, levels, 1L,
      Map("y" -> 1995)).count()
    val direct = fact.filter(col("y") === 1995)
    assert(nullMember === direct.filter(col("st").isNull).count())
    assert(rolledUp === direct.count())
    assert(nullMember < rolledUp,
      "the null member must be a strict subset of the rolled-up cell")
  }

  test("a forgotten or typo'd level key fails loudly instead of drilling the wrong rows") {
    val missing = intercept[IllegalArgumentException] {
      Cube.drillThrough(fact, levels, 0L, Map[String, Any]("y" -> 1995))
    }
    assert(missing.getMessage.contains("missing for grouped levels") &&
      missing.getMessage.contains("st"))
    val typo = intercept[IllegalArgumentException] {
      Cube.drillThrough(fact, levels, 1L,
        Map[String, Any]("year" -> 1995, "y" -> 1995))
    }
    assert(typo.getMessage.contains("unknown levels") &&
      typo.getMessage.contains("year"))
    // a non-null value for a level the gid says is ROLLED UP means the
    // gid and the cell row disagree — drilling would return a superset
    val stale = intercept[IllegalArgumentException] {
      Cube.drillThrough(fact, levels, 1L,
        Map[String, Any]("y" -> 1995, "st" -> "O"))
    }
    assert(stale.getMessage.contains("rolled up by gid"))
    // ...but a NULL there is exactly what a member-space row carries —
    // accepted (the member-space reconciliation test feeds whole rows)
    assert(Cube.drillThrough(fact, levels, 1L,
      Map[String, Any]("y" -> 1995, "st" -> null)).count() ===
      fact.filter(col("y") === 1995).count())
  }

  test("the drill predicate pushes to the parquet scan") {
    val root = java.nio.file.Files.createTempDirectory("dthru").toString
    try {
      fact.write.parquet(s"$root/fact")
      val drilled = Cube.drillThrough(spark.read.parquet(s"$root/fact"),
        levels, 0L, Map[String, Any]("y" -> 1995, "st" -> null))
      val plan = drilled.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters:") &&
        plan.contains("EqualTo(y,1995)") && plan.contains("IsNull(st)"),
        s"drill predicates must reach the scan:\n$plan")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
