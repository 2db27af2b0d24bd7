package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic shard assignment for training-data export.
  *
  * Every LLM training pipeline ends with "write the curated corpus as
  * N shuffled shards whose contents are stable across reruns": the
  * trainer streams shards in order, so shard membership and intra-
  * shard order must be a pure function of the data — not of Spark's
  * partitioning, task scheduling, or `rand()`. (The reference caches
  * its training extract as a single parquet with a seeded
  * `df.sample(random_state=42)` — `machineLearning.py:147` — which
  * pins ONE engine's RNG; this is the engine-portable, distributed
  * form of the same intent.)
  *
  * Scheme: shard = value of the first two hex chars of md5(id) modulo
  * `nShards` — uniform (md5 is), deterministic, and computable
  * verbatim in any SQL engine (`instr` over the hex alphabet; no
  * engine-specific hash). Intra-shard order = full md5(id), i.e. a
  * deterministic global shuffle: adjacent source rows land in
  * different shards and positions, which is exactly the decorrelation
  * a sequential trainer wants.
  *
  * Scale shape: the ONLY wide operation is one repartition on the
  * shard id followed by a partition-local sort — Spark's
  * `repartition(n, col) + sortWithinPartitions` is the canonical
  * write-path plan (one shuffle, no global sort). 256 hash cells mod
  * nShards keeps within ±1 cell of perfect balance for nShards ≤ 256;
  * for more shards, widen the prefix (4 hex chars → 65536 cells) —
  * the two-char form is fixed here for oracle portability.
  */
object Shards {

  /** Engine-portable shard id in [0, nShards): two-hex-char md5 prefix
    * valued via `instr` over the hex alphabet (both Spark and ANSI-ish
    * oracles evaluate the identical expression text). */
  def shardCol(idCol: String, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 256,
      s"nShards must be in [1,256] under the 2-hex-char scheme, got $nShards")
    expr(
      s"""CAST(((instr('0123456789abcdef',
         |        substring(md5(cast($idCol as string)), 1, 1)) - 1) * 16
         |     + instr('0123456789abcdef',
         |        substring(md5(cast($idCol as string)), 2, 1)) - 1)
         |    % $nShards AS BIGINT)""".stripMargin)
  }

  /** Rows tagged with (shard, sort_key) and physically arranged for
    * the shard write: one shuffle on shard id, then a partition-local
    * sort on (shard, sort_key) — shard values hash-share physical
    * partitions, so the leading shard key keeps each shard contiguous
    * and internally md5-ordered. Calling `.write.partitionBy("shard")`
    * on the result produces byte-stable shard files. */
  def arrange(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    df.withColumn("shard", shardCol(idCol, nShards))
      .withColumn("sort_key", md5(col(idCol).cast("string")))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("sort_key"))

  /** Shard-balance profile: per-shard row count and the sort-key range
    * (min/max md5) — the reproducibility receipt a pipeline logs next
    * to the export. Pure aggregate, no driver state. */
  def profile(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    df.withColumn("shard", shardCol(idCol, nShards))
      .withColumn("__h", md5(col(idCol).cast("string")))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"),
        min(col("__h")).as("h_min"), max(col("__h")).as("h_max"))
}
