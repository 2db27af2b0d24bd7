package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Scala reference implementation (leak variant) for tiny graphs. */
  private def reference(edges: Seq[(String, String, Double)], d: Double,
      iters: Int): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val p = edges.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).sum).toMap
      .map { case ((s, t), w) => (s, t, w / outW(s)) }
    var r = nodes.map(_ -> 1.0 / nodes.size).toMap
    for (_ <- 1 to iters) {
      val contrib = p.toSeq.groupBy(_._2).view
        .mapValues(_.map { case (s, _, pr) => r(s) * pr }.sum).toMap
      r = nodes.map(v =>
        v -> ((1 - d) / nodes.size + d * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String, Double)], d: Double = 0.85,
      iters: Int = 3): Map[String, Double] =
    PageRank.run(edges.toDF("s", "t", "w"), "s", "t", "w", d, iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("symmetric 2-cycle: both nodes hold rank 0.5 at every iteration") {
    val got = run(Seq(("a", "b", 1.0), ("b", "a", 1.0)))
    assert(got === Map("a" -> 0.5, "b" -> 0.5))
  }

  test("matches the reference on a weighted graph with a dangling node") {
    val edges = Seq(("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0),
      ("c", "a", 0.0) /* zero-weight edge: c still dangles in effect? no — p=0 */ ,
      ("d", "a", 5.0))
    // drop the degenerate zero-weight edge: 0/0-adjacent cases are not
    // part of the contract
    val clean = edges.filter(_._3 > 0)
    val got = run(clean)
    val exp = reference(clean, 0.85, 3)
    exp.foreach { case (v, r) =>
      assert(math.abs(got(v) - r) < 1e-6, s"node $v: ${got(v)} vs $r")
    }
    // b has no out-edge contribution beyond c; d receives only base
    assert(got("d") < got("c"))
  }

  test("parallel edges sum their weights") {
    val merged = run(Seq(("a", "b", 1.0), ("a", "b", 2.0), ("a", "c", 3.0),
      ("b", "a", 1.0), ("c", "a", 1.0)))
    val pre = run(Seq(("a", "b", 3.0), ("a", "c", 3.0),
      ("b", "a", 1.0), ("c", "a", 1.0)))
    assert(merged === pre)
  }

  test("more in-weight means more rank") {
    // hub: everyone points at h; h spreads thinly back
    val got = run(Seq(("a", "h", 1.0), ("b", "h", 1.0), ("c", "h", 1.0),
      ("h", "a", 1.0), ("h", "b", 1.0), ("h", "c", 1.0)))
    assert(got("h") > got("a") && got("h") > got("b") && got("h") > got("c"))
  }
}
