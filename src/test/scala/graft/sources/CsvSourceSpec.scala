package graft.sources

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}

import graft.TestSpark
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class CsvSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("name", StringType),
    StructField("city", StringType),
    StructField("n", IntegerType)))

  private def write(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("csv_src").toString
    Files.write(Paths.get(s"$dir/data.csv"),
      lines.mkString("\n").getBytes(Charset.forName("UTF-8")))
    s"$dir/data.csv"
  }

  test("repair preserves a quoted field containing the separator") {
    // the corrupt row is the whole true line quoted as one cell, and
    // that line itself has a quoted city with an embedded comma — a
    // raw split would shift n into city and null out n
    val path = write(Seq(
      "name,city,n",
      "ana,quito,1",
      "\"bob,\"\"guayaquil, sur\"\",2\""))
    val out = CsvSource.repair(
      CsvSource.scan(spark, CsvSource.FileSpec(path), schema), schema, ",")
      .orderBy("name")
      .collect().map(r => (r.getString(0), r.getString(1), r.get(2)))
    assert(out.toSeq === Seq(
      ("ana", "quito", 1),
      ("bob", "guayaquil, sur", 2)))
  }

  test("a row that is still malformed after re-parse is dropped, not fatal") {
    val path = write(Seq(
      "name,city,n",
      "ana,quito,1",
      "\"just-two,fields\"")) // arity 2 < 3 after re-parse
    val out = CsvSource.repair(
      CsvSource.scan(spark, CsvSource.FileSpec(path), schema), schema, ",")
    assert(out.count() === 1)
    assert(out.head.getString(0) === "ana")
  }

  test("over-arity embedded line is dropped, not silently truncated") {
    val path = write(Seq(
      "name,city,n",
      "ana,quito,1",
      "\"bob,guayaquil,2,EXTRA\"")) // 4 fields > 3 after re-parse
    val out = CsvSource.repair(
      CsvSource.scan(spark, CsvSource.FileSpec(path), schema), schema, ",")
    assert(out.count() === 1)
    assert(out.head.getString(0) === "ana")
  }

  test("non-numeric value in a repaired row nulls the field, not the job") {
    val path = write(Seq(
      "name,city,n",
      "\"ana,quito,not-a-number\""))
    val out = CsvSource.repair(
      CsvSource.scan(spark, CsvSource.FileSpec(path), schema), schema, ",")
      .collect()
    assert(out.length === 1)
    assert(out.head.getString(0) === "ana" && out.head.isNullAt(2))
  }
}
