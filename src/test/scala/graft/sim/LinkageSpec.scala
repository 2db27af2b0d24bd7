package graft.sim

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class LinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val master = Seq(
    (1L, "acme corporation", "north"),
    (2L, "globex industries", "north"),
    (3L, "initech llc", "south"),
    (4L, "umbrella corp", "south"))
    .toDF("id", "name", "zone")

  test("bestMatch resolves typos to the right entity within its block") {
    val dirty = Seq(
      (101L, "acme corpration", "north"),   // typo of 1
      (102L, "globex industreis", "north"), // typo of 2
      (103L, "intech llc", "south"))        // typo of 3
      .toDF("id", "name", "zone")
    val got = Linkage.bestMatch(dirty, "id", master, "id",
        Seq(("zone", "zone")), Seq(("name", "name", 1.0)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(101L -> 1L, 102L -> 2L, 103L -> 3L))
  }

  test("blocking is respected: no candidates outside the block") {
    val dirty = Seq((201L, "acme corporation", "south")).toDF("id", "name", "zone")
    val pairs = Linkage.scoredPairs(dirty, "id", master, "id",
        Seq(("zone", "zone")), Seq(("name", "name", 1.0)))
      .collect().map(_.getLong(1)).toSet
    assert(pairs === Set(3L, 4L)) // only the south block, despite the exact name
  }

  test("sortedNeighborhoodPairs: exact w-neighborhood across partition boundaries") {
    // 40 rows over several range partitions; expected pairs from the
    // definition directly
    val rows = (1L to 40L).map(i => (i, f"key-$i%03d"))
    val df = rows.toDF("id", "k").repartition(6) // scrambled input layout
    for (w <- Seq(1, 3)) {
      val got = Linkage.sortedNeighborhoodPairs(df, "id", "k", w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        a <- 1L to 40L; b <- (a + 1) to math.min(40L, a + w)
      } yield (a, b)).toSet
      assert(got === want, s"w=$w")
    }
  }

  test("multi-field weights shift the winner") {
    val right = Seq(
      (1L, "acme", "chicago", "z"),
      (2L, "acme", "boston", "z")).toDF("id", "name", "city", "zone")
    val dirty = Seq((9L, "acme", "bostn", "z")).toDF("id", "name", "city", "zone")
    val byCity = Linkage.bestMatch(dirty, "id", right, "id",
        Seq(("zone", "zone")),
        Seq(("name", "name", 0.3), ("city", "city", 0.7)))
      .head
    assert(byCity.getLong(1) === 2L)
    // scores are normalized to [0, 1]
    assert(byCity.getDouble(2) > 0.9 && byCity.getDouble(2) <= 1.0)
  }

  test("goldenRecords: latest non-null wins, most-frequent wins, ties deterministic") {
    // cluster 1: name latest at seq 3 is null → seq 2's value survives;
    // segment counts tie a=1, b=1 → largest value "b" wins
    val recs = Seq[(Long, Long, String, String)](
      (1L, 1L, "old name", "a"),
      (1L, 2L, "new name", "b"),
      (1L, 3L, null, null),
      (2L, 5L, "solo", "x"), (2L, 6L, "solo2", "x"), (2L, 7L, "solo3", "y"))
      .toDF("cl", "seq", "name", "seg")
    val g = graft.sim.Linkage.goldenRecords(recs, "cl", Seq(
        "name" -> graft.sim.Linkage.Latest("seq"),
        "seg" -> graft.sim.Linkage.MostFrequent))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(g(1L) === (("new name", "b"))) // null at seq 3 never wins
    assert(g(2L) === (("solo3", "x")))    // latest name; x outnumbers y
    assert(g.size === 2)
  }

  test("goldenRecords: all-null attribute yields a null, cluster row kept") {
    val recs = Seq[(Long, Long, String)]((9L, 1L, null), (9L, 2L, null))
      .toDF("cl", "seq", "name")
    val g = graft.sim.Linkage.goldenRecords(recs, "cl",
      Seq("name" -> graft.sim.Linkage.Latest("seq"))).collect()
    assert(g.length === 1 && g.head.getLong(0) === 9L && g.head.isNullAt(1))
  }
}
