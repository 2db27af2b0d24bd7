package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join via key salting.
  *
  * When one side is too large to broadcast and the join key is skewed
  * (a handful of hot keys own most rows), a plain shuffle join sends
  * every row of a hot key to ONE reducer — the straggler that decides
  * job wall-clock at 100 TB. Salting spreads each hot key over
  * `buckets` reducers: the big side gets a random salt in [0, buckets),
  * the other side is replicated once per salt value, and the join key
  * becomes (key, salt). Row multiplication is buckets × |small side| —
  * chosen by the caller, bounded, and map-side (explode, no shuffle of
  * the replicas beyond the join's own exchange).
  *
  * AQE's skew-join handles moderate skew automatically (and stays on in
  * our sessions); explicit salting is for the pathological tail AQE
  * splits poorly — e.g. one key with 30% of all rows — and for
  * deterministic plan shape under `spark.sql.adaptive.enabled=false`.
  */
object SaltedJoin {

  /** @param big     the large, skewed side (gets a per-row salt)
    * @param other   the side cheap enough to replicate `buckets` times
    * @param buckets salt fan-out; hot-key rows spread over this many
    *                reducers
    */
  private val supportedTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  def join(big: DataFrame, other: DataFrame, keys: Seq[String],
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // right/full outer are NOT salt-compatible: an unmatched row of the
    // replicated side would be emitted once per salt replica
    require(supportedTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"joinType '$joinType' not supported by salted join " +
        "(right/full outer would duplicate unmatched replicated-side rows)")
    val saltedBig = big.withColumn("__salt",
      (rand(42) * buckets).cast("int"))
    val saltedOther = other.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedBig.join(saltedOther, keys :+ "__salt", joinType).drop("__salt")
  }
}
