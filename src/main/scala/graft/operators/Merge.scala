package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC change-set application — the MERGE/upsert half of the warehouse
  * maintenance story ([[graft.etl.Scd]] is the history-keeping half).
  * A snapshot plus a stream of keyed change rows (upserts and deletes)
  * produces the next snapshot version.
  *
  * Scale shape: the naive formulation is a FULL OUTER join of snapshot
  * and changes — a shuffle of the ENTIRE snapshot against a change set
  * that is typically orders of magnitude smaller. This one is
  * change-set-sized instead:
  *
  *   1. collapse the change log to one winner per key (`max_by` over
  *      the sequence column — single hash aggregate over the change
  *      set only, bounded buffers, no windows);
  *   2. LEFT ANTI join the snapshot against the change keys — with a
  *      small change set Catalyst broadcasts it, so the 100 TB snapshot
  *      is scanned once with a map-side hash probe and NEVER shuffled;
  *   3. union the surviving upserts.
  *
  * Delete semantics: a `D` row removes the key; upserts (`U`/`I` — any
  * non-delete op) replace the target row wholesale, and an upsert for
  * an absent key inserts (MERGE's WHEN NOT MATCHED arm). Later
  * sequence wins per key; among equal sequences the delete loses (an
  * upsert at the same version re-creates the row — the convention
  * Debezium-style compacted topics use, and deterministic either way).
  *
  * NULL keys: a NULL-keyed change row can never match a target row
  * under equality MERGE semantics and is dropped from the change set;
  * NULL-keyed snapshot rows pass through untouched (anti join keeps
  * non-matching rows, and NULL never equals a change key).
  */
object Merge {

  /** @param target   current snapshot; its column set defines the output
    * @param changes  change log: `target`'s columns + `opCol` + `seqCol`
    * @param keyCols  equality key (must be non-empty)
    * @param opCol    change kind column; value `"D"` = delete, anything
    *                 else = upsert
    * @param seqCol   per-key change ordering (commit timestamp / LSN);
    *                 highest wins
    */
  def applyChanges(target: DataFrame, changes: DataFrame,
      keyCols: Seq[String], opCol: String, seqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "MERGE needs at least one key column")
    val cols = target.columns.toSeq
    require(!cols.contains(opCol) && !cols.contains(seqCol),
      s"target must not already carry $opCol/$seqCol")

    // one winner per key: max_by over a struct keeps the whole change
    // row atomically (field-by-field max would stitch together values
    // from different change rows). Tie-break: upsert beats delete at
    // the same sequence, encoded as a secondary sort field so the
    // argmax stays a single bounded-buffer aggregate.
    val payload = struct((cols :+ opCol).map(col): _*)
    val winner = changes
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(payload,
        struct(col(seqCol), (col(opCol) =!= lit("D")).cast("int"))).as("__w"))
      .select(keyCols.map(col) :+ col("__w"): _*)

    // AQE turns this anti join into a broadcast probe when the change
    // set is runtime-small — the snapshot side then never shuffles
    val survivors = target.join(
      winner.select(keyCols.map(col): _*), keyCols, "left_anti")
    val upserts = winner
      .filter(col("__w").getField(opCol) =!= lit("D"))
      .select(cols.map(c => col("__w").getField(c).as(c)): _*)
    survivors.unionByName(upserts)
  }

  /** Streaming MERGE: [[applyChanges]] under Structured Streaming —
    * a change-log stream continuously maintains a parquet snapshot,
    * the "CDC into the lake" deployment shape. Each micro-batch
    * applies its changes to the CURRENT snapshot and republishes via
    * [[graft.sources.Warehouse.publish]]'s atomic rename-swap, so a
    * concurrent reader always sees a complete committed version —
    * `foreachBatch` is exactly Spark's sanctioned hook for
    * merge-style sinks the built-in file sink can't express (it only
    * appends). Batch boundaries preserve the seqCol winner-per-key
    * contract PROVIDED batches arrive in sequence order (the standard
    * CDC topic/file-landing contract): within a batch the seqCol
    * argmax picks the winner, and a later batch's changes are by
    * assumption never older than an applied one — so replaying in
    * waves equals one big apply ([[MergeSpec]] asserts replay ≡
    * one-shot). An out-of-order landing would need a seqCol guard
    * column persisted in the snapshot; keep the stream ordered
    * instead.
    *
    * First batch against a missing snapshot starts from empty. The
    * snapshot is read fresh per batch (self-referencing streams must
    * not cache the target). Exactly-once: foreachBatch can re-run a
    * batch on failure recovery — applying the same change set twice
    * is idempotent here (same winners win), which is what makes this
    * safe without transactional storage. */
  def applyChangesStream(spark: org.apache.spark.sql.SparkSession,
      changesDir: String, changesSchemaFrom: DataFrame,
      snapshotPath: String, keyCols: Seq[String], opCol: String,
      seqCol: String, queryName: String,
      maxFilesPerTrigger: Option[Int] = None,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val targetSchema = org.apache.spark.sql.types.StructType(
      changesSchemaFrom.schema.filterNot(f =>
        f.name == opCol || f.name == seqCol))
    val reader = spark.readStream
      .schema(changesSchemaFrom.schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val writer = reader.parquet(changesDir)
      .writeStream
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val fs = new org.apache.hadoop.fs.Path(snapshotPath)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val target =
          if (fs.exists(new org.apache.hadoop.fs.Path(snapshotPath)))
            spark.read.schema(targetSchema).parquet(snapshotPath)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            targetSchema)
        val next = applyChanges(target, batch, keyCols, opCol, seqCol)
        // the new version reads the CURRENT snapshot while writing the
        // temp dir; the swap happens only after the write completes
        graft.sources.Warehouse.publish(spark, snapshotPath) { tmp =>
          next.write.mode("overwrite").parquet(tmp)
        }
      }
      .start()
  }

  /** Snapshot diff — the inverse of [[applyChanges]]: derive the keyed
    * change log (`I`nsert / `U`pdate / `D`elete) that turns `oldSnap`
    * into `newSnap`. The table-compare / backfill-audit primitive, and
    * the CDC bootstrap when no change stream exists.
    *
    * One co-partitioned FULL OUTER join on the key — the minimum
    * possible data movement for a diff (both sides must meet; with
    * both snapshots written bucketed on the key via
    * `Warehouse.writeBucketed` even that exchange disappears). Payload
    * comparison is a single null-safe struct equality, not N per-column
    * joins.
    *
    * Output: key columns + payload columns + `opCol`. `U`/`I` rows
    * carry the new values; `D` rows carry the deleted row's old values
    * (the CDC before-image convention). Unchanged rows are absent.
    * NULL-keyed rows are excluded on both sides (equality MERGE
    * semantics, as in [[applyChanges]]).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(oldSnap.columns.sorted.sameElements(newSnap.columns.sorted),
      "snapshots must share a column set")
    val cols = oldSnap.columns.toSeq
    val payloadCols = cols.filterNot(keyCols.contains)
    // key-only tables still need a comparable struct; a constant field
    // makes the payloads always equal, so key presence alone drives ops
    def packed(df: DataFrame) =
      if (payloadCols.isEmpty) struct(lit(0).as("__none"))
      else struct(payloadCols.map(col): _*)
    val o = oldSnap
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(keyCols.map(col) :+ packed(oldSnap).as("__old"): _*)
    val n = newSnap
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(keyCols.map(col) :+ packed(newSnap).as("__new"): _*)
    val joined = o.join(n, keyCols, "full_outer")
    val op = when(col("__old").isNull, lit("I"))
      .when(col("__new").isNull, lit("D"))
      .when(!(col("__old") <=> col("__new")), lit("U"))
    val image = coalesce(col("__new"), col("__old"))
    joined
      .withColumn(opCol, op)
      .filter(col(opCol).isNotNull)
      .select(keyCols.map(col) ++
        payloadCols.map(c => image.getField(c).as(c)) :+ col(opCol): _*)
  }
}
