package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair association — support / confidence / lift for
  * item pairs that co-occur in transactions (the frequent-itemset
  * k=2 workhorse: "customers who bought A also bought B").
  *
  * Scale shape: the pair space comes from a SELF-JOIN of the distinct
  * (transaction, item) relation on the transaction key with `a < b` —
  * each transaction of k items emits C(k,2) pairs, so the blowup is
  * bounded by basket size, not corpus size (retail baskets are tens of
  * items; guard pathological baskets with a size cap upstream if the
  * domain allows thousand-item "transactions"). Everything else is
  * exact counting: one (a,b)-grain aggregate, one item-grain marginal
  * joined twice, and the three ratios at the edge from exact longs.
  * The `a < b` ordering means each unordered pair appears once;
  * confidence is emitted for BOTH directions explicitly.
  */
object Basket {

  /** @param minPairCount drop pairs below this co-occurrence count
    *        BEFORE the marginal joins (the support floor — also what
    *        keeps the rule table small)
    * @return (antecedent, consequent, pair_count, support,
    *         confidence, lift) — one row per direction */
  def pairRules(tx: DataFrame, txCol: String, itemCol: String,
      minPairCount: Long): DataFrame = {
    require(minPairCount >= 1, "minPairCount must be >= 1")
    val items = tx.select(col(txCol).as("__t"), col(itemCol).as("__i"))
      .filter(col("__i").isNotNull && col("__t").isNotNull)
      .distinct()
    val nTx = items.select(col("__t")).distinct()
      .agg(count(lit(1)).as("__n"))
    val singles = items.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val a = items.select(col("__t"), col("__i").as("a"))
    val b = items.select(col("__t"), col("__i").as("b"))
    val pairs = a.join(b, Seq("__t")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("nab"))
      .filter(col("nab") >= minPairCount)
    val withMarginals = pairs
      .join(singles.select(col("__i").as("a"), col("__ni").as("na")), Seq("a"))
      .join(singles.select(col("__i").as("b"), col("__ni").as("nb")), Seq("b"))
      .crossJoin(broadcast(nTx))
    def dir(ant: String, cons: String, nAnt: String) = withMarginals.select(
      col(ant).as("antecedent"), col(cons).as("consequent"),
      col("nab").as("pair_count"),
      round(col("nab").cast("double") / col("__n").cast("double"), 6)
        .as("support"),
      round(col("nab").cast("double") / col(nAnt).cast("double"), 6)
        .as("confidence"),
      round(col("nab").cast("double") * col("__n").cast("double") /
        (col("na").cast("double") * col("nb").cast("double")), 6).as("lift"))
    dir("a", "b", "na").unionByName(dir("b", "a", "nb"))
  }
}
