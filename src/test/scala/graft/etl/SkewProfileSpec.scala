package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SkewProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keyStats measures a planted hot key") {
    // key "hot" 6 rows, "a"/"b" 1 row each → max 6, avg 8/3
    val df = (Seq.fill(6)("hot") ++ Seq("a", "b")).toDF("k")
    val r = SkewProfile.keyStats(df, "k").collect()(0)
    assert(r.getAs[Long]("n_rows") === 8L)
    assert(r.getAs[Long]("n_keys") === 3L)
    assert(r.getAs[Long]("max_cnt") === 6L)
    assert(r.getAs[Double]("top1_share") === 0.75)
    assert(r.getAs[Double]("skew") === 2.25) // 6 / (8/3)
    assert(r.getAs[Double]("p50_cnt") === 1.0)
  }

  test("uniform key reports skew 1.0") {
    val df = Seq("a", "a", "b", "b", "c", "c").toDF("k")
    val r = SkewProfile.keyStats(df, "k").collect()(0)
    assert(r.getAs[Double]("skew") === 1.0)
    assert(r.getAs[Double]("top1_share") - 1.0 / 3 < 1e-9)
  }

  test("NULL keys are one colocated key, not dropped") {
    val df = Seq[java.lang.Long](null, null, null, 1L).toDF("k")
    val r = SkewProfile.keyStats(df, "k").collect()(0)
    assert(r.getAs[Long]("n_rows") === 4L)
    assert(r.getAs[Long]("n_keys") === 2L)
    assert(r.getAs[Long]("max_cnt") === 3L)
  }
}
