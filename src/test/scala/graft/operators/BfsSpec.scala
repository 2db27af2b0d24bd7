package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BfsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bfs(edges: Seq[(Long, Long)], src: Long, maxHops: Int = 20) =
    Bfs.hops(edges.toDF("s", "d"), "s", "d", src, maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hop distances on a directed path + branch; unreachable absent") {
    // 1→2→3→4, 2→5; 9 isolated on the source side of nothing
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L), (9L, 1L))
    assert(bfs(e, 1L) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 2L))
  }

  test("cycles terminate; shortest hop wins over longer alternates") {
    // 1→2→3→1 cycle plus shortcut 1→3
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    assert(bfs(e, 1L) === Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("maxHops truncates the search") {
    val chain = (1L to 10L).sliding(2).map(p => (p(0), p(1))).toSeq
    val got = bfs(chain, 1L, maxHops = 3)
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }
}
