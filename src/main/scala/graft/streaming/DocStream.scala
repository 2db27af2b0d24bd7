package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup

/** Streaming document ingestion with online near-duplicate rejection —
  * the continuous face of the batch curation stack: documents arrive
  * as files, each micro-batch drops its own near-dups and everything
  * near-duplicate to the ALREADY-ACCEPTED corpus, and survivors land
  * as the accepted corpus itself (sink = index: no second store to
  * keep consistent).
  *
  * Dedup semantics are GREEDY FIRST-WINS — the online policy every
  * production ingest runs: per batch, documents near-duplicate to the
  * accepted corpus are rejected FIRST, then the survivors dedup among
  * themselves (keep-min-id connected components). Cross-first order
  * matters: a doomed row must not act as an in-batch cluster keeper
  * and take fresh rows down with it. This differs from offline
  * connected-component dedup exactly on CHAINS (a–b, b–c, no a–c)
  * once a and c are separated from b's verdict: offline drops c
  * transitively; online accepts c because b was never admitted — a
  * real and documented divergence. On pair/triangle-shaped dup graphs
  * the two agree (q184 exploits that: its fixture graph is pairs +
  * one triangle, so the REAL stream replays against the offline SQL
  * oracle).
  *
  * Scale shape, per micro-batch: in-batch MinHash-LSH near-dup
  * (shuffle = batch × bands sketches), then ONE cross-corpus LSH join
  * batch × accepted ([[Dedup.crossNearDupPairs]] — the accepted side
  * re-banded per batch; at production scale the banded accepted
  * signatures would be the materialized side, the
  * [[graft.sim.Similarity.appendToAnnIndexStream]] layout). State is
  * the accepted PARQUET, not a state store — restarts are free.
  *
  * Exactly-once: foreachBatch is at-least-once, so each batch writes
  * its own `batch_id=N/` partition AND a marker under `_applied/`;
  * a replayed batch short-circuits on the marker — it must NOT
  * recompute against an accepted corpus that now contains its own
  * output (every row would self-match and vanish). The
  * marker-after-write window is the standard non-transactional-sink
  * residue ([[graft.sim.Similarity.appendToAnnIndexStream]] note). */
object DocStream {

  /** Accepted corpus so far: the union of committed batch partitions
    * (underscore paths are invisible to the parquet reader). None
    * before the first commit. */
  private def acceptedSoFar(spark: SparkSession, sinkDir: String,
      schemaFrom: DataFrame): Option[DataFrame] = {
    val p = new Path(sinkDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val parts = fs.listStatus(p)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
        .map(_.getPath.toString)
      if (parts.isEmpty) None
      else Some(spark.read.schema(schemaFrom.schema).parquet(parts.toIndexedSeq: _*))
    }
  }

  /** Start the ingest: file source under `srcDir` (schema from
    * `schemaFrom`), accepted documents under `sinkDir/batch_id=N/`.
    * `Trigger.AvailableNow` drains what has landed and stops — re-run
    * on a schedule, or swap the trigger for continuous tailing. Reuse
    * `queryName` exactly when resuming the same checkpoint (batch ids
    * restart at 0 per checkpoint — the marker lineage must follow). */
  def nearDupIngestStream(spark: SparkSession, srcDir: String,
      schemaFrom: DataFrame, idCol: String, textCol: String,
      threshold: Double, sinkDir: String, queryName: String,
      checkpoint: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schemaFrom.schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val writer = reader
      .parquet(srcDir)
      .writeStream
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val fs = new Path(sinkDir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val marker = new Path(s"$sinkDir/_applied/$queryName/$batchId")
        if (!fs.exists(marker)) {
          // cross-corpus rejection FIRST, in-batch dedup on the
          // survivors: a batch row that is doomed against the
          // accepted corpus must not act as an in-batch cluster
          // keeper and take fresh rows down with it (that would make
          // acceptance depend on batch boundaries even for non-chain
          // graphs) — cross-first matches per-document sequential
          // greedy whenever the batch's own dup graph is CC-clean
          val survivors = acceptedSoFar(spark, sinkDir, batch) match {
            case Some(acc) =>
              val hit = Dedup.crossNearDupPairs(batch, idCol, textCol,
                acc, idCol, textCol, threshold)
                .select(col("id_a").as(idCol)).distinct()
              batch.join(hit, Seq(idCol), "left_anti")
            case None => batch
          }
          val out = Dedup.dropNearDups(survivors, idCol,
            Dedup.nearDupPairs(survivors, idCol, textCol, threshold))
          out.write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")
          fs.mkdirs(marker.getParent)
          fs.create(marker, true).close()
        }
        ()
      }
      .start()
  }

  /** The accepted corpus as a batch relation (for downstream reads and
    * the q184 replay). */
  def accepted(spark: SparkSession, sinkDir: String,
      schemaFrom: DataFrame): DataFrame =
    acceptedSoFar(spark, sinkDir, schemaFrom)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schemaFrom.schema))
}
