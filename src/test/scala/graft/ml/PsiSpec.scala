package graft.ml

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class PsiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical distributions score PSI 0") {
    val a = Seq(1.0, 2.0, 3.0, 7.0, 9.0).toDF("v")
    val r = Metrics.psi(a, a, "v", bins = 5, lo = 0, hi = 10).collect()(0)
    assert(r.getAs[Long]("n_ref") === 5L)
    assert(r.getAs[Long]("n_cur") === 5L)
    assert(r.getAs[Double]("psi") === 0.0)
  }

  test("a shifted distribution scores positive, hand-checked PSI") {
    // ref all in bin 0, cur all in bin 1; two bins over [0, 2)
    val ref = Seq(0.5, 0.5).toDF("v")
    val cur = Seq(1.5, 1.5).toDF("v")
    val r = Metrics.psi(ref, cur, "v", bins = 2, lo = 0, hi = 2).collect()(0)
    // p = (2.5/3, 0.5/3), q = (0.5/3, 2.5/3):
    // psi = 2 * (2/3) * ln(5) ≈ 1.072963
    assert(math.abs(r.getAs[Double]("psi") - 2.0 / 3 * math.log(5.0) * 2)
      < 1e-6)
  }

  test("outliers clamp to edge bins; NULLs excluded") {
    val ref = Seq[java.lang.Double](-100.0, 0.5, null).toDF("v")
    val bins = Metrics.psiBins(ref, ref, "v", bins = 2, lo = 0, hi = 2)
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("ref_cnt"))
      .toMap
    assert(bins(0L) === 2L) // -100 clamped into bin 0
    assert(bins(1L) === 0L)
  }

  test("bins empty on both sides keep the report shape and term 0") {
    val a = Seq(0.1).toDF("v")
    val out = Metrics.psiBins(a, a, "v", bins = 4, lo = 0, hi = 4).collect()
    assert(out.length === 4)
    assert(out.forall(_.getAs[Double]("term") === 0.0))
  }
}
