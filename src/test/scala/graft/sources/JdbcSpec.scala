package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A4/A7 exercised for REAL against embedded Derby (ships with Spark
  * for the Hive metastore): batched append → single-connection read →
  * range-partitioned parallel read. No network DB exists in the build
  * container; Derby gives the same JDBC relation/dialect code paths a
  * PostgreSQL URL would take.
  */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("derby_home").toString)

  private def freshUrl(): String = {
    val dir = java.nio.file.Files.createTempDirectory("derby_db").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("writeAppend(batchsize=1000) → read round-trips values and schema") {
    val url = freshUrl()
    val df = (1L to 500L).map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "v")
    Jdbc.writeAppend(df, url, "t_roundtrip", "app", "app")
    val back = Jdbc.read(spark, url, "t_roundtrip", "app", "app")
    assert(back.count() === 500)
    val got = back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val want = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === want)
    // append semantics: a second write adds, never truncates
    Jdbc.writeAppend(df.limit(10), url, "t_roundtrip", "app", "app")
    assert(Jdbc.read(spark, url, "t_roundtrip", "app", "app").count() === 510)
  }

  test("readPartitioned splits the scan into parallel range strides") {
    val url = freshUrl()
    val df = (1L to 400L).map(i => (i, i % 7)).toDF("id", "grp")
    Jdbc.writeAppend(df, url, "t_part", "app", "app")
    val part = Jdbc.readPartitioned(spark, url, "t_part",
      partitionColumn = "id", lowerBound = 1L, upperBound = 401L,
      numPartitions = 4, user = "app", password = "app")
    assert(part.rdd.getNumPartitions === 4)
    assert(part.count() === 400) // strides cover the full range, no loss/dup
    assert(part.agg(sum("id")).head.getLong(0) === (1L to 400L).sum)
  }
}
