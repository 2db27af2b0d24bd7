package graft.ml

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TensorPrepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    (1L, "b", "x", 10.0, Some("t1")),
    (2L, "a", "y", 20.0, Some("t0")),
    (3L, "c", "x", 30.0, Some("t1")),
    (4L, "a", "z", 40.0, None) // null target → dropped
  ).toDF("id", "cat", "cat2", "num", "target")

  test("fit: alphabetical label codes (sklearn LabelEncoder parity), null target dropped") {
    val enc = TensorPrep.fit(fixture, "target", Seq("cat", "cat2"), Seq("num"))
    assert(enc.catCodes("cat") === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    assert(enc.catCodes("cat2") === Map("x" -> 0L, "y" -> 1L)) // "z" only on the dropped row
    assert(enc.targetCodes === Map("t0" -> 0L, "t1" -> 1L))
    val (m, sd) = enc.numStats("num")
    assert(m === 20.0) // mean of 10,20,30 (row 4 dropped)
    assert(math.abs(sd - 10.0) < 1e-12) // sample std of 10,20,30
  }

  test("transform: codes resolve map-side, unknown value encodes to 0, float32 x_num") {
    val enc = TensorPrep.fit(fixture, "target", Seq("cat"), Seq("num"))
    val out = TensorPrep.transform(
      fixture.unionByName(Seq((5L, "UNSEEN", "x", 20.0, Some("t0")))
        .toDF("id", "cat", "cat2", "num", "target")), enc)
    assert(out.count() === 4) // null-target row dropped, unseen row kept
    val rows = out.select("id", "y", "x_cat", "x_num").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[Long](2).head, r.getSeq[Float](3).head))).toMap
    assert(rows(1L) === ((1L, 1L, -1.0f))) // (10-20)/10
    assert(rows(2L) === ((0L, 0L, 0.0f)))
    assert(rows(5L) === ((0L, 0L, 0.0f))) // UNSEEN cat → unknown token 0
  }

  test("save/load round-trips: loaded encoders transform identically") {
    val orders = TestSpark.table("orders")
    val enc = TensorPrep.fit(orders, "o_orderstatus",
      Seq("o_orderpriority"), Seq("o_totalprice"))
    val path = java.nio.file.Files.createTempDirectory("tp_enc").toString
    TensorPrep.save(spark, enc, path)
    val loaded = TensorPrep.load(spark, path)
    assert(loaded === enc)
    val a = TensorPrep.transform(orders, enc)
      .select("o_orderkey", "y", "x_cat", "x_num").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2), r.getSeq[Float](3)))
    val b = TensorPrep.transform(orders, loaded)
      .select("o_orderkey", "y", "x_cat", "x_num").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2), r.getSeq[Float](3)))
    assert(a.toSeq === b.toSeq)
  }

  test("tensor frame writes to parquet and reads back typed (the A11 sink)") {
    val enc = TensorPrep.fit(fixture, "target", Seq("cat"), Seq("num"))
    val out = TensorPrep.transform(fixture, enc).select("id", "x_num", "x_cat", "y")
    val path = java.nio.file.Files.createTempDirectory("tensors").toString + "/t"
    out.write.parquet(path)
    val back = spark.read.parquet(path)
    assert(back.schema("x_num").dataType.simpleString === "array<float>")
    assert(back.schema("x_cat").dataType.simpleString === "array<bigint>")
    assert(back.count() === 3)
  }
}
