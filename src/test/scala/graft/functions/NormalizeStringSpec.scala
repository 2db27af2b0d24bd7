package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormalizeStringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(normalize_string($"t")).head.getString(0)

  test("lowercases and strips accents") {
    assert(norm("Canción Ñandú ÁÉÍÓÚ") === "cancion nandu aeiou")
  }

  test("collapses whitespace runs and trims") {
    assert(norm("  a\t\tb \n c  ") === "a b c")
  }

  test("identity on already-normal text") {
    assert(norm("hello world 42") === "hello world 42")
  }

  test("null propagates") {
    val r = Seq(Option.empty[String]).toDF("t")
      .select(normalize_string($"t")).head
    assert(r.isNullAt(0))
  }

  test("empty string") { assert(norm("") === "") }

  test("matches interpreted eval under codegen") {
    // 100 varied strings through a full projection (codegen path) must
    // equal direct static calls (interpreted path).
    val data = (0 until 100).map(i => s"Ärger  Nr.$i\t ÜBER costraße")
    val viaSpark = data.toDF("t").select(normalize_string($"t"))
      .collect().map(_.getString(0))
    val direct = data.map(s => NormalizeString.normalize(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString)
    assert(viaSpark.toSeq === direct)
  }
}
