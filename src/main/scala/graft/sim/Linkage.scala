package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution): blocked candidate generation +
  * weighted multi-field similarity scoring + best-match resolution —
  * the dedup-across-sources pipeline (customer files, vendor masters)
  * the reference's fuzzy classification gestures at
  * (`Datos/preprocessing.py:158-163`), assembled from the engine's
  * own pieces.
  *
  * Scale shape: candidates come ONLY from a blocking equi-join
  * (nation/zip/length-bucket — the caller's blocking keys), never a
  * cross join; scoring is a map-side expression chain of codegen'd
  * [[graft.functions.JaroWinkler]] calls; resolution is the bounded
  * top-1 heap per left entity ([[graft.features.Features
  * .topKPerGroupBounded]]), so a hot block never materializes a
  * sorted candidate list. Blocking recall is the caller's contract
  * (pairs split across blocks are never compared — standard ER
  * practice; use multiple passes with different keys for higher
  * recall).
  */
object Linkage {

  /** Candidate pairs with a weighted Jaro–Winkler score in [0, 1].
    *
    * @param blockKeys (leftCol, rightCol) equality keys
    * @param fields    (leftCol, rightCol, weight) similarity fields —
    *                  compared case-folded; weights need not sum to 1
    */
  def scoredPairs(left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      blockKeys: Seq[(String, String)],
      fields: Seq[(String, String, Double)]): DataFrame = {
    require(blockKeys.nonEmpty, "blocking keys required (no cross joins)")
    require(fields.nonEmpty && fields.forall(_._3 > 0), "positive field weights")
    val l = left.as("__ll")
    val r = right.as("__lr")
    val cond = blockKeys.map { case (a, b) =>
      col(s"__ll.$a") === col(s"__lr.$b")
    }.reduce(_ && _)
    val totalW = fields.map(_._3).sum
    val score: Column = fields.map { case (a, b, w) =>
      graft.functions.jaro_winkler(
        lower(col(s"__ll.$a")), lower(col(s"__lr.$b"))) * lit(w)
    }.reduce(_ + _) / lit(totalW)
    l.join(r, cond)
      .select(col(s"__ll.$leftId").as("left_id"),
        col(s"__lr.$rightId").as("right_id"), score.as("score"))
  }

  /** Best match per LEFT entity (highest score; ties to the smallest
    * right id) — bounded-heap top-1, never a per-block sort. */
  def bestMatch(left: DataFrame, leftId: String,
      right: DataFrame, rightId: String,
      blockKeys: Seq[(String, String)],
      fields: Seq[(String, String, Double)]): DataFrame = {
    val scored = scoredPairs(left, leftId, right, rightId, blockKeys, fields)
    graft.features.Features.topKPerGroupBounded(scored, "left_id",
        struct(negate(col("score")).as("ns"), col("right_id").as("right_id")), 1)
      .select(col("left_id"), col("right_id"), (-col("ns")).as("score"))
  }
}
