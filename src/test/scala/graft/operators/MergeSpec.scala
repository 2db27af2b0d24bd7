package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snap(rows: (Long, String)*) = rows.toDF("k", "v")

  private def chg(rows: (Long, String, String, Long)*) =
    rows.toDF("k", "v", "op", "seq")

  private def result(target: org.apache.spark.sql.DataFrame,
      changes: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    Merge.applyChanges(target, changes, Seq("k"), "op", "seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("streaming MERGE: per-file replay converges to the one-shot apply") {
    val changesDir = java.nio.file.Files.createTempDirectory("cdc_in").toString
    val snapPath = java.nio.file.Files.createTempDirectory("cdc_snap")
      .toString + "/snapshot"
    val schemaFrom = chg((0L, "", "", 0L)).limit(0)
    // land each wave as a PLAIN parquet FILE in the watched dir (a
    // df.write creates a directory, which the file stream source
    // would not descend into)
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val st = java.nio.file.Files.createTempDirectory("cdc_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(st)
      val part = new java.io.File(st).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(changesDir, name))
    }
    // wave 1: initial inserts; wave 2: update + delete + new key —
    // replayed one file per micro-batch
    land(chg((1L, "a", "I", 1L), (2L, "b", "I", 1L), (3L, "c", "I", 1L)),
      "w1.parquet")
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_ck").toString
    val q = Merge.applyChangesStream(spark, changesDir, schemaFrom,
      snapPath, Seq("k"), "op", "seq", "cdc_test_1",
      maxFilesPerTrigger = Some(1), checkpoint = Some(ckpt))
    assert(q.awaitTermination(120000), "streaming query timed out")
    land(chg((2L, "B", "U", 2L), (3L, "", "D", 2L), (4L, "d", "I", 2L)),
      "w2.parquet")
    // same checkpoint: the restarted query RESUMES past wave 1
    val q2 = Merge.applyChangesStream(spark, changesDir, schemaFrom,
      snapPath, Seq("k"), "op", "seq", "cdc_test_2",
      maxFilesPerTrigger = Some(1), checkpoint = Some(ckpt))
    assert(q2.awaitTermination(120000), "streaming query timed out")

    val got = spark.read.parquet(snapPath)
      .collect().map(r => (r.getLong(r.fieldIndex("k")),
        r.getString(r.fieldIndex("v")))).toSet
    // one-shot ground truth over the full change log
    val oneShot = Merge.applyChanges(
      snap().limit(0),
      chg((1L, "a", "I", 1L), (2L, "b", "I", 1L), (3L, "c", "I", 1L),
        (2L, "B", "U", 2L), (3L, "", "D", 2L), (4L, "d", "I", 2L)),
      Seq("k"), "op", "seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === oneShot)
    assert(got === Set(1L -> "a", 2L -> "B", 4L -> "d"))
  }

  test("snapshotDiff plants I/U/D exactly; unchanged rows absent") {
    val out = Merge.snapshotDiff(
        snap(1L -> "a", 2L -> "b", 3L -> "c"),
        snap(1L -> "a", 2L -> "B", 4L -> "d"), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out === Set((2L, "B", "U"), (3L, "c", "D"), (4L, "d", "I")))
  }

  test("snapshotDiff: null payloads compare null-safely; null keys excluded") {
    val old = Seq[(java.lang.Long, String)]((1L, null), (null, "x")).toDF("k", "v")
    val neu = Seq[(java.lang.Long, String)]((1L, null), (2L, null)).toDF("k", "v")
    val out = Merge.snapshotDiff(old, neu, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(out === Set((2L, "I"))) // (1, null)->(1, null) unchanged
  }

  test("applyChanges(old, snapshotDiff(old, new)) reproduces new") {
    val old = snap(1L -> "a", 2L -> "b", 3L -> "c", 5L -> "e")
    val neu = snap(1L -> "a", 2L -> "B", 4L -> "d")
    val changes = Merge.snapshotDiff(old, neu, Seq("k"))
      .withColumn("seq", lit(1L))
    val applied = Merge.applyChanges(old, changes, Seq("k"), "op", "seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(applied === neu.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("snapshotDiff on a key-only table: presence drives I/D, never U") {
    val old = Seq(1L, 2L).toDF("k")
    val neu = Seq(2L, 3L).toDF("k")
    val out = Merge.snapshotDiff(old, neu, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((1L, "D"), (3L, "I")))
  }

  test("upsert updates existing, inserts absent; delete removes") {
    val out = result(
      snap(1L -> "a", 2L -> "b", 3L -> "c"),
      chg((2L, "B", "U", 1L), (3L, "", "D", 1L), (4L, "d", "I", 1L)))
    assert(out === Set(1L -> "a", 2L -> "B", 4L -> "d"))
  }

  test("latest sequence wins per key") {
    val out = result(
      snap(1L -> "a"),
      chg((1L, "x", "U", 1L), (1L, "y", "U", 3L), (1L, "z", "U", 2L)))
    assert(out === Set(1L -> "y"))
  }

  test("delete then re-insert at a later sequence keeps the row") {
    val out = result(
      snap(1L -> "a"),
      chg((1L, "", "D", 1L), (1L, "back", "U", 2L)))
    assert(out === Set(1L -> "back"))
  }

  test("upsert beats delete at the SAME sequence") {
    val out = result(
      snap(1L -> "a"),
      chg((1L, "", "D", 5L), (1L, "kept", "U", 5L)))
    assert(out === Set(1L -> "kept"))
  }

  test("delete of an absent key is a no-op") {
    val out = result(snap(1L -> "a"), chg((9L, "", "D", 1L)))
    assert(out === Set(1L -> "a"))
  }

  test("null-keyed change rows are dropped; null-keyed target rows survive") {
    val target = Seq((Some(1L), "a"), (None, "ghost")).toDF("k", "v")
    val changes = Seq((Option.empty[Long], "x", "U", 1L)).toDF("k", "v", "op", "seq")
    val out = Merge.applyChanges(target, changes, Seq("k"), "op", "seq")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(out === Set((Some(1L), "a"), (None, "ghost")))
  }

  test("empty change set is identity") {
    val out = result(snap(1L -> "a", 2L -> "b"), chg())
    assert(out === Set(1L -> "a", 2L -> "b"))
  }

  test("composite keys") {
    val target = Seq((1L, "x", "old"), (1L, "y", "keep")).toDF("k1", "k2", "v")
    val changes = Seq((1L, "x", "new", "U", 1L), (2L, "z", "ins", "U", 1L))
      .toDF("k1", "k2", "v", "op", "seq")
    val out = Merge.applyChanges(target, changes, Seq("k1", "k2"), "op", "seq")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out === Set((1L, "x", "new"), (1L, "y", "keep"), (2L, "z", "ins")))
  }

  test("rejects a target that already carries the op/seq columns") {
    val bad = Seq((1L, "a", "U")).toDF("k", "v", "op")
    val err = intercept[IllegalArgumentException] {
      Merge.applyChanges(bad, chg(), Seq("k"), "op", "seq")
    }
    assert(err.getMessage.contains("op"))
  }
}
