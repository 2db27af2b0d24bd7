package graft.operators

import scala.util.Random

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): Long =
    Triangles.triangleCount(edges.toDF("s", "d"), "s", "d")
      .select("triangles").head.getLong(0)

  test("planted shapes: triangle, square, K4; loops and dup edges ignored") {
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 1L))) === 1L)
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) === 0L) // square
    // K4 has 4 triangles; reversed/duplicate/self edges must not add
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(tri(k4 ++ k4.map(_.swap) ++ Seq((2L, 2L))) === 4L)
  }

  test("matches the brute-force count on a random graph") {
    val rnd = new Random(5)
    val edges = Seq.fill(200)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
    val canon = edges.map { case (a, b) => (a min b, a max b) }.toSet
    val brute = (for {
      (a, b) <- canon; c <- 0L until 25L
      if c > b && canon((a, c)) && canon((b, c))
    } yield (a, b, c)).size.toLong
    assert(tri(edges) === brute)
    assert(brute > 0L, "fixture should contain triangles")
  }
}
