package graft.sources

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OrcSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("roundtrip preserves rows and schema; zstd works too") {
    val orders = TestSpark.table("orders")
    for (codec <- Seq("snappy", "zstd")) {
      val dir = Files.createTempDirectory(s"orc_$codec").toString
      OrcSource.write(orders, dir, codec)
      val back = OrcSource.read(spark, dir)
      assert(back.schema === orders.schema)
      assert(back.count() === orders.count())
      assert(back.exceptAll(orders).count() === 0)
      assert(orders.exceptAll(back).count() === 0)
    }
  }

  test("filters push into the ORC scan and projection prunes columns") {
    val dir = Files.createTempDirectory("orc_push").toString
    OrcSource.write(TestSpark.table("orders"), dir)
    val q = OrcSource.read(spark, dir)
      .filter(col("o_totalprice") > 300000d)
      .select("o_orderkey", "o_totalprice")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_totalprice), " +
      "GreaterThan(o_totalprice,300000.0)]"), s"no pushdown:\n$scan")
    assert(scan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"no pruning:\n$scan")
    assert(q.count() > 0)
  }
}
