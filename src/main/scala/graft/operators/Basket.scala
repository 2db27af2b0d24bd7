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
  * items; `maxBasketSize` caps pathological thousand-item
  * "transactions" IN the operator — over-cap baskets drop whole, with
  * an [[org.apache.spark.sql.Observation]] counter so the drop is
  * visible, the Dedup bucket-guard idiom). Everything else is exact
  * counting: one (a,b)-grain aggregate, one item-grain marginal
  * joined twice, and the three ratios at the edge from exact longs.
  * The `a < b` ordering means each unordered pair appears once;
  * confidence is emitted for BOTH directions explicitly.
  */
object Basket {

  /** @param minPairCount drop pairs below this co-occurrence count
    *        BEFORE the marginal joins (the support floor — also what
    *        keeps the rule table small)
    * @param maxBasketSize baskets with more distinct items than this
    *        are dropped ENTIRELY before pairing (a k-item basket emits
    *        C(k,2) pairs — one million-item "transaction" would emit
    *        5·10¹¹). Dropped baskets also leave the transaction total
    *        and item marginals, keeping support/confidence consistent
    *        with the pair universe actually mined.
    * @param obs optional Observation reporting `dropped_baskets` and
    *        `max_basket_size` after the action — nonzero means the cap
    *        bit; raise it only if the domain truly has jumbo baskets
    * @return (antecedent, consequent, pair_count, support,
    *         confidence, lift) — one row per direction */
  def pairRules(tx: DataFrame, txCol: String, itemCol: String,
      minPairCount: Long, maxBasketSize: Int = 10000,
      obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(minPairCount >= 1, "minPairCount must be >= 1")
    require(maxBasketSize >= 2, "maxBasketSize must be >= 2")
    val raw = tx.select(col(txCol).as("__t"), col(itemCol).as("__i"))
      .filter(col("__i").isNotNull && col("__t").isNotNull)
      .distinct()
    val sizeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__t"))
    val markW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__t")).orderBy(col("__i"))
    // __bn = basket size; __rn = 1 exactly once per basket, so the
    // observed basket counter is exact without a distinct aggregate
    // (CollectMetrics disallows those). Both windows share the one
    // __t hash exchange.
    val counted = raw.withColumn("__bn", count(lit(1)).over(sizeW))
      .withColumn("__rn", row_number().over(markW))
    val observed = obs.fold(counted)(o => counted.observe(o,
      sum(when(col("__bn") > maxBasketSize && col("__rn") === 1, 1L)
        .otherwise(0L)).as("dropped_baskets"),
      max(col("__bn")).as("max_basket_size")))
    val items = observed.filter(col("__bn") <= maxBasketSize)
      .drop("__bn", "__rn")
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
    // both rule directions from ONE pass: a unionByName of two
    // projections over withMarginals would DUPLICATE the whole mining
    // subtree (self-join + three joins — Catalyst materializes no
    // common subexpression across union branches; the r16 plan audit
    // counted 94 Exchanges, two full copies of the pipeline). An
    // explode emits the two directed rows per undirected pair from
    // the single subtree — same rows, half the plan (guide §7.2:
    // duplicated subtrees).
    withMarginals.select(col("nab"), col("__n"), col("na"), col("nb"),
      explode(array(
        struct(col("a").as("antecedent"), col("b").as("consequent"),
          col("na").as("nant")),
        struct(col("b").as("antecedent"), col("a").as("consequent"),
          col("nb").as("nant")))).as("__d"))
      .select(col("__d.antecedent").as("antecedent"),
        col("__d.consequent").as("consequent"),
        col("nab").as("pair_count"),
        round(col("nab").cast("double") / col("__n").cast("double"), 6)
          .as("support"),
        round(col("nab").cast("double") / col("__d.nant").cast("double"), 6)
          .as("confidence"),
        round(col("nab").cast("double") * col("__n").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")), 6)
          .as("lift"))
  }
}
