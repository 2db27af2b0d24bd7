package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class HierarchySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def flatten(rows: Seq[(Long, java.lang.Long)], maxRounds: Int = 20) =
    Hierarchy.rootAndDepth(rows.toDF("id", "parent"), "id", "parent", maxRounds)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap


  private def pairs(rows: Seq[(Long, java.lang.Long)], maxRounds: Int = 20) =
    Hierarchy.closure(rows.toDF("id", "parent"), "id", "parent", maxRounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("closure: every (desc, anc, dist) pair of the forest, self-pairs at 0") {
    //  1 ← 2 ← 4 ; 2 ← 5 ← 6 ; 10 ← 11
    val rows = Seq[(Long, java.lang.Long)](
      (1L, null), (2L, 1L), (4L, 2L), (5L, 2L), (6L, 5L),
      (10L, null), (11L, 10L))
    // brute-force reference: walk each node's parent chain
    val parent = rows.collect { case (k, p) if p != null => k -> p.longValue }.toMap
    val want = rows.flatMap { case (k, _) =>
      Iterator.iterate(Option(k))(_.flatMap(parent.get))
        .takeWhile(_.isDefined).map(_.get).zipWithIndex
        .map { case (anc, d) => (k, anc, d.toLong) }.toSeq
    }.toSet
    assert(pairs(rows) === want)
  }

  test("closure: completes when the last pairs land exactly in round maxRounds (confirming round)") {
    // chain 1←2←3: max dist 2 = 2^1, needs one growth round — with
    // maxRounds=1 the confirming no-growth round must still fit
    val rows = Seq[(Long, java.lang.Long)]((1L, null), (2L, 1L), (3L, 2L))
    val got = pairs(rows, maxRounds = 1)
    assert(got.contains((3L, 1L, 2L)), s"deepest pair missing: $got")
    assert(got.size === 3 + 3) // 3 self-pairs + (2,1,1),(3,2,1),(3,1,2)
    // and a height ABOVE 2^maxRounds still fails loudly, not silently
    val deep = Seq[(Long, java.lang.Long)](
      (1L, null), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L), (6L, 5L))
    val e = intercept[IllegalArgumentException] { pairs(deep, maxRounds = 1) }
    assert(e.getMessage.contains("did not converge"))
  }

  test("closure: a pointer cycle saturates at min distances instead of hanging or exploding") {
    // 1 → 2 → 3 → 1 (corrupt), plus a clean node 9
    val rows = Seq[(Long, java.lang.Long)]((1L, 3L), (2L, 1L), (3L, 2L), (9L, null))
    val got = pairs(rows, maxRounds = 12)
    // each cycle member reaches every member at the MIN distance, and
    // the cycle SURFACES as a nonzero-distance self-pair (diagnostic)
    assert(got.size === 13, s"cycle must saturate, got ${got.size} pairs: $got")
    assert(got.contains((2L, 1L, 1L)) && got.contains((2L, 3L, 2L)) &&
      got.contains((2L, 2L, 0L)) && got.contains((2L, 2L, 3L)) &&
      got.contains((9L, 9L, 0L)))
  }

  test("forest with two trees: correct roots and depths") {
    //  1 ← 2 ← 4      10 ← 11
    //      2 ← 5 ← 6
    val got = flatten(Seq(
      (1L, null), (2L, 1L), (4L, 2L), (5L, 2L), (6L, 5L),
      (10L, null), (11L, 10L)))
    assert(got(1L) === ((Some(1L), Some(0L))))
    assert(got(4L) === ((Some(1L), Some(2L))))
    assert(got(6L) === ((Some(1L), Some(3L))))
    assert(got(10L) === ((Some(10L), Some(0L))))
    assert(got(11L) === ((Some(10L), Some(1L))))
  }

  test("deep chain resolves in logarithmic rounds") {
    // chain of 1000: height 999; 10 doubling rounds must suffice
    val chain = (1L to 1000L).map(i =>
      (i, if (i == 1) null else java.lang.Long.valueOf(i - 1)))
    val got = flatten(chain, maxRounds = 10)
    assert(got(1000L) === ((Some(1L), Some(999L))))
    assert(got(500L) === ((Some(1L), Some(499L))))
    assert(got.values.forall(_._1 === Some(1L)))
  }

  test("self-parent counts as root; cycle surfaces as NULL, not a hang") {
    val got = flatten(Seq(
      (1L, 1L),          // self-parent root
      (2L, 1L),
      (7L, 8L), (8L, 7L) // 2-cycle
    ), maxRounds = 5)
    assert(got(1L) === ((Some(1L), Some(0L))))
    assert(got(2L) === ((Some(1L), Some(1L))))
    assert(got(7L) === ((None, None)))
    assert(got(8L) === ((None, None)))
  }

  test("dangling parent pointer surfaces as NULL") {
    val got = flatten(Seq((1L, null), (2L, 99L)), maxRounds = 3)
    assert(got(1L) === ((Some(1L), Some(0L))))
    assert(got(2L) === ((None, None)))
  }

  test("closureMove ≡ full rebuild over the moved parent relation") {
    //  1 ← 2 ← 4 ; 2 ← 5 ← 6 ; 10 ← 11 — move 2's subtree under 10
    val rows = Seq[(Long, java.lang.Long)](
      (1L, null), (2L, 1L), (4L, 2L), (5L, 2L), (6L, 5L),
      (10L, null), (11L, 10L))
    val cl = Hierarchy.closure(rows.toDF("id", "parent"), "id", "parent")
    val moved = Hierarchy.closureMove(cl, 2L, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val movedRows = rows.map { case (k, p) =>
      if (k == 2L) (2L, java.lang.Long.valueOf(10L)) else (k, p) }
    val want = pairs(movedRows)
    assert(moved === want)
    // spot-check the three pair classes: crossing pair dropped...
    assert(!moved.exists(p => p._1 == 6L && p._2 == 1L),
      "old out-of-subtree path must be gone")
    // ...within-subtree pair untouched...
    assert(moved.contains((6L, 2L, 2L)))
    // ...and the new out-of-subtree path at d1+1+d2
    assert(moved.contains((6L, 10L, 3L)))
  }

  test("closureMove: a root re-parent and a leaf re-parent both maintain exactly") {
    val rows = Seq[(Long, java.lang.Long)](
      (1L, null), (2L, 1L), (4L, 2L), (10L, null), (11L, 10L))
    val cl = Hierarchy.closure(rows.toDF("id", "parent"), "id", "parent")
    // whole tree 1 moves under leaf 11
    val moved = Hierarchy.closureMove(cl, 1L, 11L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = pairs(rows.map { case (k, p) =>
      if (k == 1L) (1L, java.lang.Long.valueOf(11L)) else (k, p) })
    assert(moved === want)
  }

  test("closureMove rejects a cycle-introducing move loudly") {
    val rows = Seq[(Long, java.lang.Long)]((1L, null), (2L, 1L), (4L, 2L))
    val cl = Hierarchy.closure(rows.toDF("id", "parent"), "id", "parent")
    val e = intercept[IllegalArgumentException] {
      Hierarchy.closureMove(cl, 1L, 4L).collect()
    }
    assert(e.getMessage.contains("cycle"))
    // self-move is the degenerate cycle
    val e2 = intercept[IllegalArgumentException] {
      Hierarchy.closureMove(cl, 2L, 2L).collect()
    }
    assert(e2.getMessage.contains("cycle"))
    // unknown node surfaces as its own error, not an empty result
    val e3 = intercept[IllegalArgumentException] {
      Hierarchy.closureMove(cl, 99L, 1L).collect()
    }
    assert(e3.getMessage.contains("not in the closure"))
    // unknown NEW PARENT too — an empty ancestor relation would
    // silently orphan the subtree from every rollup above it
    val e4 = intercept[IllegalArgumentException] {
      Hierarchy.closureMove(cl, 2L, 99L).collect()
    }
    assert(e4.getMessage.contains("orphan"))
  }

  test("closureInsert ≡ rebuild: leaf under a parent, and a new root") {
    val rows = Seq[(Long, java.lang.Long)](
      (1L, null), (2L, 1L), (4L, 2L))
    val cl = Hierarchy.closure(rows.toDF("id", "parent"), "id", "parent")
    val got = Hierarchy.closureInsert(cl, 9L, 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === pairs(rows :+ ((9L, java.lang.Long.valueOf(2L)))))
    val gotRoot = Hierarchy.closureInsert(cl, 9L, null)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotRoot === pairs(rows :+ ((9L, null: java.lang.Long))))
    // duplicate insert and unknown parent are loud
    assert(intercept[IllegalArgumentException] {
      Hierarchy.closureInsert(cl, 2L, 1L).collect()
    }.getMessage.contains("already in the closure"))
    assert(intercept[IllegalArgumentException] {
      Hierarchy.closureInsert(cl, 9L, 99L).collect()
    }.getMessage.contains("orphan"))
  }

  test("closureDelete ≡ rebuild without the subtree; unknown node is loud") {
    val rows = Seq[(Long, java.lang.Long)](
      (1L, null), (2L, 1L), (4L, 2L), (5L, 2L), (6L, 5L), (10L, null))
    val cl = Hierarchy.closure(rows.toDF("id", "parent"), "id", "parent")
    val got = Hierarchy.closureDelete(cl, 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === pairs(rows.filterNot(r => Set(5L, 6L)(r._1))))
    // deleting a whole ROOT tree leaves the other tree intact
    val gotRoot = Hierarchy.closureDelete(cl, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotRoot === pairs(Seq[(Long, java.lang.Long)]((10L, null))))
    assert(intercept[IllegalArgumentException] {
      Hierarchy.closureDelete(cl, 99L).collect()
    }.getMessage.contains("not in the closure"))
  }
}
