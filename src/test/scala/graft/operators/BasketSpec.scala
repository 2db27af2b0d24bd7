package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BasketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 baskets: {a,b} ×2, {a,b,c}, {c}; duplicate item rows collapse
  private lazy val tx = Seq(
    (1L, "a"), (1L, "b"), (1L, "a"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "b"), (3L, "c"),
    (4L, "c"))
    .toDF("t", "i")

  test("pairRules: hand-checked support, confidence, lift, both directions") {
    val r = Basket.pairRules(tx, "t", "i", minPairCount = 1L)
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5)))).toMap
    // n=4 tx; na=3, nb=3, nc=2; nab=3, nac=1, nbc=1
    for (k <- Seq(("a", "b"), ("b", "a"))) {
      val (nab, sup, conf, lift) = r(k)
      assert(nab === 3L && sup === 0.75 && conf === 1.0)
      assert(math.abs(lift - 4.0 / 3) < 1e-6, s"$k lift $lift")
    }
    // a→c: conf 1/3, lift = 1·4/(3·2)
    val (nac, supAc, confAc, liftAc) = r(("a", "c"))
    assert(nac === 1L && supAc === 0.25)
    assert(math.abs(confAc - 0.333333) < 1e-6)
    assert(math.abs(liftAc - 4.0 / 6) < 1e-6)
    // c→a direction has its own confidence: 1/2
    assert(r(("c", "a"))._3 === 0.5)
    assert(r.size === 6) // 3 unordered pairs × 2 directions
  }

  test("minPairCount floors the rule table before marginals") {
    val r = Basket.pairRules(tx, "t", "i", minPairCount = 2L)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(r === Set(("a", "b"), ("b", "a")))
  }

  test("maxBasketSize drops a planted 1000-item basket whole, observed") {
    val spark2 = spark
    import spark2.implicits._
    val jumbo = (1 to 1000).map(i => (99L, f"jumbo_$i%04d")).toDF("t", "i")
    val obs = org.apache.spark.sql.Observation("basket-guard")
    val rules = Basket.pairRules(tx.unionByName(jumbo), "t", "i",
      minPairCount = 1L, maxBasketSize = 100, obs = Some(obs))
      .collect()
    // the jumbo basket contributes NOTHING — not pairs, not marginals,
    // not the transaction total — so every rule matches the baseline
    val baseline = Basket.pairRules(tx, "t", "i", minPairCount = 1L)
      .collect().map(_.toSeq).toSet
    assert(rules.map(_.toSeq).toSet === baseline)
    assert(!rules.exists(_.getString(0).startsWith("jumbo")))
    val m = obs.get
    assert(m("dropped_baskets") === 1L, m.toString)
    assert(m("max_basket_size") === 1000L, m.toString)
  }
}
