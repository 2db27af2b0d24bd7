package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.PinnedWindow
import graft.sim.Similarity

/** Deterministic relational k-means — Lloyd's algorithm expressed as a
  * fixed number of DataFrame rounds, with every arithmetic step pinned
  * to an engine-portable form so an external SQL engine replays the
  * whole fit bit-for-bit. This is the clustering face the reference's
  * `machineLearning.py` KMeans consumer needs (cluster assignment +
  * per-point distance), and the centroid producer
  * [[graft.dedup.Dedup.semanticDupPairsWith]] consumes for
  * production-shape SemDeDup (assign → intra-cluster pair scan).
  *
  * Why not `spark.ml.clustering.KMeans` (which [[Similarity.ivfFit]]
  * already wraps)? Its fit is seed-dependent and engine-private — fine
  * for IVF centroid quality, useless when the *assignment itself* is
  * the data product that must be reproducible across engines and
  * re-runs (training-data curation: the cluster column written today
  * must be recomputable next year). Determinism contract:
  *
  *  - Init: the k corpus vectors with the lexicographically smallest
  *    `(md5(id), id)` — the repo's portable pseudo-random draw
  *    (`TakeOrdered` heap selection, no global sort).
  *  - Assignment: argmin over clusters of ⟨c,c⟩ − 2⟨v,c⟩ (the
  *    [[Similarity.ivfCell]] expanded form — left-to-right
  *    [[graft.functions.vec_dot]] folds are bit-comparable with SQL
  *    engines' `list_dot_product`), ties to the lower cluster id.
  *  - Update: per-(cluster, dim) mean with the sum accumulated in
  *    DECIMAL(38,12) (order-independent, so partial-aggregation
  *    plans can't perturb it) and the mean rounded to a 9-decimal
  *    grid before the next round — each round's centroids are exact
  *    rational points both engines agree on.
  *  - A cluster that loses every point keeps its previous centroid.
  *
  * Scale shape, per round: assignment is a broadcast of the k×dim
  * centroid relation into one hash aggregate (no shuffle of vectors
  * beyond the per-id argmin combine); the update posexplodes to
  * (cluster, dim, value) scalar cells — the q117 idiom, vectors never
  * shuffle whole — into a (k × dim)-sized aggregate. Centroids are
  * localCheckpointed each round (tiny relation), so lineage stays flat
  * across rounds instead of re-running every prior round per action.
  */
object KMeansRel {

  /** Final centroids after `iters` Lloyd rounds: (cluster: 0..k-1 in
    * seed order, centroid: array<double> on the 9-decimal grid —
    * except round 0's raw seed vectors, which are the corpus's own). */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(k >= 1, s"need k >= 1 clusters, got $k")
    require(iters >= 0, s"need iters >= 0, got $iters")
    val v = clean(vectors, idCol, vecCol)
    var centroids = seedCentroids(v, idCol, k)
    for (_ <- 1 to iters)
      centroids = step(v, centroids, idCol, k).localCheckpoint()
    centroids
  }

  /** Assignment under the fitted centroids: one row per input vector,
    * (idCol, cluster, d2) with d2 = full squared euclidean distance to
    * the assigned centroid, rounded to 6 places. */
  def fitAssign(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val v = clean(vectors, idCol, vecCol)
    val centroids = fit(vectors, idCol, vecCol, k, iters)
    assign(v, centroids, idCol)
      .withColumn("d2", round(
        Similarity.dot(col("__v"), col("__v"))
          - lit(2.0) * Similarity.dot(col("__v"), col("__cv"))
          + Similarity.dot(col("__cv"), col("__cv")), 6))
      .select(col(idCol), col("cluster"), col("d2"))
  }

  private def clean(vectors: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    vectors.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))

  /** The k seed vectors in md5 order, numbered 0..k-1. The corpus-wide
    * selection is `orderBy(...).limit(k)` — a TakeOrdered distributed
    * heap, NOT a global sort; only the k survivors pass through the
    * (pinned, k-row) numbering window. */
  private def seedCentroids(v: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val kRows = v
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k)
    val w = Window.partitionBy(PinnedWindow.key(col(idCol)))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    kRows.withColumn("cluster", row_number().over(w).cast("long") - 1)
      .select(col("cluster"), col("__v").as("__cv"))
  }

  /** Nearest-centroid assignment joined back with both the point and
    * its winning centroid: (idCol, __v, cluster, __cv). */
  private def assign(v: DataFrame, centroids: DataFrame,
      idCol: String): DataFrame = {
    val scored = v.crossJoin(broadcast(centroids))
      .groupBy(col(idCol))
      .agg(min_by(col("cluster"), struct(
        (Similarity.dot(col("__cv"), col("__cv"))
          - lit(2.0) * Similarity.dot(col("__v"), col("__cv"))).as("d"),
        col("cluster").as("c"))).as("cluster"))
    v.join(scored, Seq(idCol)).join(broadcast(centroids), Seq("cluster"))
  }

  /** One Lloyd round: reassign, then per-(cluster, dim) grid-rounded
    * decimal-exact means; empty clusters keep their old centroid. */
  private def step(v: DataFrame, centroids: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val cells = assign(v, centroids, idCol)
      .select(col("cluster"), posexplode(col("__v")).as(Seq("__p", "__e")))
      .groupBy(col("cluster"), col("__p"))
      .agg(round(sum(col("__e").cast("decimal(38,12)")).cast("double")
        / count(lit(1)), 9).as("__m"))
    // Rebuild arrays: the per-cluster buffer is dim-sized (bounded by
    // construction — embedding width, not data volume).
    val rebuilt = cells.groupBy(col("cluster"))
      .agg(transform(array_sort(collect_list(struct(col("__p"), col("__m")))),
        x => x.getField("__m")).as("__nv"))
    centroids.join(rebuilt, Seq("cluster"), "left")
      .select(col("cluster"), coalesce(col("__nv"), col("__cv")).as("__cv"))
  }
}
