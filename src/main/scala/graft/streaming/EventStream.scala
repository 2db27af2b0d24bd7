package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value).
  *
  * SURVEY §2.J: the reference has no event-stream processing — PDI
  * "streams" are bounded pipelined buffers — so the batch plans are the
  * parity surface, and the Structured Streaming variants are the
  * additive scale path: the SAME logical plan under `readStream` with
  * watermarked windows, run with `Trigger.AvailableNow` for bounded
  * replay. Stateful sessionization uses
  * `flatMapGroupsWithState` (the idiomatic custom-state operator).
  */
object EventStream {

  /** Tumbling-window aggregate — shared logical shape for batch and
    * streaming (q13's plan). */
  def windowedCounts(events: DataFrame, windowLen: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Streaming variant: file source → watermark → windowed agg.
    *
    * Output mode matters for the state-size claim: in Append (the
    * default here, the scale path) the watermark finalizes and EVICTS
    * windows, so state is O(active windows). Complete mode re-emits
    * every window each trigger and never evicts — only acceptable for
    * bounded replays (tests pass it explicitly to see all windows of
    * an AvailableNow run, where Append would hold back windows not yet
    * past the watermark). */
  def windowedCountsStream(spark: SparkSession, srcDir: String,
      schemaFrom: DataFrame, windowLen: String, watermark: String,
      queryName: String,
      outputMode: OutputMode = OutputMode.Append()): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(srcDir)
      .withWatermark("ts", watermark)
      .transform(df => windowedCounts(df, windowLen))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming exact dedup with BOUNDED state — the ingestion face of
    * `Dedup.exactGroups` for continuously arriving corpora (an at-least-
    * once upstream source replays records; training pipelines must not
    * double-count them). `dropDuplicatesWithinWatermark` keeps a key's
    * state only until the event-time watermark passes it, so state size
    * is O(keys per watermark horizon), not O(all keys ever seen) — the
    * difference between a stream that runs for years and one that OOMs.
    * Duplicates arriving farther apart than the watermark are the
    * batch dedup's job (run `Dedup.dropExactDups` over the sink). */
  def dedupStream(events: DataFrame, idCols: Seq[String], tsCol: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** File-source wrapper for [[dedupStream]] mirroring
    * [[windowedCountsStream]]'s replay harness. */
  def dedupStreamQuery(spark: SparkSession, srcDir: String,
      schemaFrom: DataFrame, idCols: Seq[String], tsCol: String,
      watermark: String, queryName: String): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(srcDir)
      .transform(df => dedupStream(df, idCols, tsCol, watermark))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream-static enrichment: the arriving event stream joined to a
    * STATIC dimension (the classic "lookup the user's segment as events
    * flow" shape). Structured Streaming plans the static side as an
    * ordinary broadcast per micro-batch — no state, no watermark
    * needed for an inner equi-join, and the dim can be swapped by
    * restarting the query (or use a Delta/refreshable source at real
    * deployments). The batch face is exactly `events.join(dim)` — q03's
    * broadcast star shape — so correctness parity is spec-checked, not
    * oracled. */
  def enrichStream(spark: SparkSession, srcDir: String,
      schemaFrom: DataFrame, dim: DataFrame, joinKey: String,
      queryName: String): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(srcDir)
      .join(broadcast(dim), Seq(joinKey))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream-stream interval join — attribution's native shape ("which
    * click within the last hour led to this purchase"): both sides are
    * unbounded streams, so the join must hold STATE, and the pair of
    * watermarks plus the time-bound join condition is what lets Spark
    * EVICT it — a click older than (purchase watermark − window) can
    * never match again and is dropped. Without the time bound the state
    * grows forever; with it, state is O(events per window horizon).
    * The batch face is the same equi-join + BETWEEN predicate, which is
    * what the spec checks parity against. */
  def intervalJoinStreams(spark: SparkSession, leftDir: String,
      rightDir: String, schemaFrom: DataFrame, joinKey: String,
      windowSeconds: Long, watermark: String,
      queryName: String): StreamingQuery = {
    val l = spark.readStream.schema(schemaFrom.schema).parquet(leftDir)
      .withWatermark("ts", watermark)
      .select(col(joinKey), col("ts").as("l_ts"),
        col("event_id").as("l_id"))
    val r = spark.readStream.schema(schemaFrom.schema).parquet(rightDir)
      .withWatermark("ts", watermark)
      .select(col(joinKey).as("__rk"), col("ts").as("r_ts"),
        col("event_id").as("r_id"))
    l.join(r,
      col(joinKey) === col("__rk") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .drop("__rk")
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Batch sessionization (gaps-and-islands): a new session starts when
    * the gap to the previous event of the same user exceeds
    * `gapSeconds`. Window functions only — one shuffle on user_id,
    * oracle-expressible in ANSI SQL. */
  def sessionizeBatch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val newSession = when(
      unix_timestamp(col("ts")) -
        unix_timestamp(lag(col("ts"), 1).over(byUser)) > gapSeconds ||
        lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0)
    events
      .withColumn("new_s", newSession)
      .withColumn("session_seq", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
  }

  /** Sessionization on the NATIVE `session_window` aggregate — the
    * one-line face of [[sessionizeBatch]]/[[sessionizeStream]] for
    * when built-in semantics suffice: Spark merges overlapping
    * per-event windows `[ts, ts+gap)` into sessions inside a
    * dedicated session-aggregation operator (batch AND streaming, no
    * custom state code). Two deliberate semantic differences from
    * [[sessionizeBatch]], both inherent to the builtin: the gap
    * comparison is strict (an event exactly `gapSeconds` after the
    * last starts a NEW session, where the hand-rolled batch plan
    * merges it), and `session_end` is `last_ts + gap` (window end),
    * not the last event's timestamp. */
  def sessionizeNative(events: DataFrame, gapSeconds: Long): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSeconds seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Streaming face of [[sessionizeNative]]: same aggregate under
    * `readStream` + watermark. In Append mode the watermark finalizes
    * and EVICTS closed sessions (state = open sessions only — the
    * production configuration); tests pass Complete to surface every
    * session of a bounded replay. */
  def sessionizeNativeStream(spark: SparkSession, srcDir: String,
      schemaFrom: DataFrame, gapSeconds: Long, watermark: String,
      queryName: String,
      outputMode: OutputMode = OutputMode.Append()): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(srcDir)
      .withWatermark("ts", watermark)
      .transform(df => sessionizeNative(df, gapSeconds))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming heavy hitters: the mergeable Misra–Gries sketch
    * aggregate ([[graft.functions.FreqSketchAgg]]) under a streaming
    * groupBy — per-key candidate sets maintained incrementally in the
    * state store, never a full-cardinality count table. Complete mode:
    * a global top-items table is a bounded, dashboard-sized result
    * re-emitted per trigger; recall ≥ the batch sketch's guarantee
    * (freq > N/(capacity+1)) because the streaming merge sequence is
    * just another merge order of the same mergeable sketch. */
  def heavyHittersStream(spark: SparkSession, srcDir: String,
      schemaFrom: DataFrame, groupCol: String, itemCol: String,
      capacity: Int, queryName: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schemaFrom.schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader
      .parquet(srcDir)
      .groupBy(col(groupCol))
      .agg(graft.functions.freq_sketch(col(itemCol), capacity).as("sketch"))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming bounded top-k per group: the [[graft.functions
    * .BoundedTopKAgg]] heap under a streaming groupBy — per-key state
    * is the ≤k-element heap (mergeable, so incremental micro-batch
    * updates are just more merges), never a growing value list. The
    * "current k best per key" live table (top sessions per user,
    * worst latencies per endpoint), Complete mode like
    * [[heavyHittersStream]]: the result is a bounded dashboard-sized
    * relation re-emitted per trigger. */
  def topKStream(spark: SparkSession, srcDir: String,
      schemaFrom: DataFrame, groupCol: String, valueCol: String,
      k: Int, queryName: String): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(srcDir)
      .groupBy(col(groupCol))
      .agg(graft.functions.bounded_topk(col(valueCol), k).as("topk"))
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming point-in-time SCD2 enrichment — the retrieval half of
    * q90 under arrival: each arriving fact resolves the dimension
    * episode IN EFFECT at its event time. The key observation that
    * makes this STATELESS: [[graft.etl.Scd.scd2FromChangeLog]] closes
    * every episode with `valid_to`, and closed half-open episodes
    * `[valid_from, valid_to)` PARTITION time per key — so the as-of
    * lookup degenerates to a stream-static interval-containment join
    * (key match + valid_from ≤ ts < valid_to, at most ONE match per
    * fact). No watermark, no state store: the dim broadcasts per
    * micro-batch exactly like [[enrichStream]]. Left join keeps facts
    * from before their key's first episode (and unknown keys) with
    * null attrs — [[graft.operators.AsOfJoin]]'s no-match contract,
    * which the parity spec checks row-for-row. Empty episodes
    * (valid_from = valid_to, two changes at one timestamp) match
    * nothing, so the later version wins at its own boundary — the
    * same collision rule as `asOf(rightTieBreak = version)`.
    *
    * At 100 TB the dim is the small side by construction (episodes,
    * not facts); if it ever outgrew broadcast, drop the hint for a
    * bucketed static table — the logical shape is unchanged. */
  def scdEnrichStream(spark: SparkSession, srcDir: String,
      schemaFrom: DataFrame, scdDim: DataFrame, key: String, ts: String,
      attrs: Seq[String], queryName: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val dim = scdDim.select(
      (col(key).as("__dk") +: col("valid_from") +: col("valid_to") +:
        attrs.map(col)).toIndexedSeq: _*)
    val reader = spark.readStream.schema(schemaFrom.schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader
      .parquet(srcDir)
      .join(broadcast(dim),
        col(key) === col("__dk") && col(ts) >= col("valid_from") &&
          (col("valid_to").isNull || col(ts) < col("valid_to")),
        "left")
      .drop("__dk", "valid_from", "valid_to")
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** General streaming as-of enrichment — for a right side that is
    * NOT episode-closed (a raw quote/sensor history, where "the match"
    * is the latest right row at or before the fact's timestamp, with
    * nothing marking where its validity ends). Runs the full batch
    * [[graft.operators.AsOfJoin.asOf]] per micro-batch under
    * `foreachBatch`: correct because the right side is static and
    * as-of is per-left-row, so batching the left side cannot change
    * any row's match (the parity + replay specs check this).
    *
    * Exactly-once by idempotence: `foreachBatch` is at-least-once —
    * after a crash between sink write and checkpoint commit the batch
    * REPLAYS with the same `batchId` — so each batch overwrites its
    * own `batch_id=N/` partition instead of appending. A replayed
    * batch rewrites identical bytes; readers see each source row once.
    * The checkpoint carries source progress, so a restart with new
    * source files processes ONLY the new files into new partitions.
    *
    * `compactEvery > 0` bounds the sink's directory count for a
    * long-running stream: once that many COMMITTED (`id < batchId`,
    * hence never-replayable) partitions accumulate, they fold into a
    * compacted `gen=K` generation ([[SinkFold.fold]] — the DocStream
    * lifecycle, data-only). Read a compacted sink through
    * [[enriched]], not raw partition discovery. */
  def asOfEnrichForeachBatch(spark: SparkSession, srcDir: String,
      schemaFrom: DataFrame, right: DataFrame, key: String, ts: String,
      carry: Seq[String], rightTieBreak: String, sinkDir: String,
      checkpointDir: String, compactEvery: Int = 0,
      maxFilesPerTrigger: Option[Int] = None,
      maxGenerations: Int = 8): StreamingQuery = {
    val reader = spark.readStream.schema(schemaFrom.schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val enrichedBatch = graft.operators.AsOfJoin
          .asOf(batch, right, key, ts, carry, rightTieBreak)
        enrichedBatch.write.mode("overwrite")
          .parquet(s"$sinkDir/batch_id=$batchId")
        if (compactEvery > 0)
          // the enriched frame IS the sink row shape — re-reading the
          // just-written partition for its schema would add a listing
          // + footer read per micro-batch for nothing
          SinkFold.fold(spark, sinkDir, schemaFrom = enrichedBatch,
            beforeBatchId = batchId, minBatches = compactEvery,
            maxGenerations = maxGenerations)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The as-of enrichment sink as one batch relation — generations
    * plus unfolded batch partitions ([[SinkFold.read]]; a compacted
    * sink holds both `gen=` and `batch_id=` directories, which naive
    * partition discovery rejects). `schemaFrom` is the ENRICHED row
    * shape (source columns + carries). */
  def enriched(spark: SparkSession, sinkDir: String,
      schemaFrom: DataFrame): DataFrame =
    SinkFold.read(spark, sinkDir, schemaFrom)

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  final case class DriftState(s: Double, seen: Long)
  final case class DriftAlert(event_type: String, ts: java.sql.Timestamp,
      event_id: Long, stat: Double, n_since_reset: Long)

  /** Online drift detection — Page's one-sided CUSUM test per series:
    * the statistic S ← max(0, S + (x − μ₀ − slack)) ratchets up while
    * values run above the reference level μ₀ and an alert fires (and
    * S resets — the sequential-test restart) when S > threshold. The
    * STREAMING changepoint face of
    * [[graft.features.Features.cusumDeviation]]'s batch diagnostic:
    * per-series running state is two numbers, so state size is
    * O(series), not O(events), and each trigger folds its (sorted)
    * batch into the carried statistic. Within-trigger order is pinned
    * by (ts, event_id) — the same deterministic-replay contract as
    * [[sessionizeStream]]; alerts are identical for any batching of
    * the same ordered events ([[cusumAlertsBatch]] is the one-batch
    * special case the spec compares against). */
  def cusumAlertsStream(events: Dataset[Event], mu0: Double,
      slack: Double, threshold: Double): Dataset[DriftAlert] = {
    import events.sparkSession.implicits._
    require(threshold > 0, "threshold must be positive")
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[DriftState, DriftAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (tpe: String, it: Iterator[Event], state: GroupState[DriftState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(DriftState(0.0, 0L))
          val alerts = scala.collection.mutable.ListBuffer[DriftAlert]()
          sorted.foreach { e =>
            val s = math.max(0.0, st.s + (e.value - mu0 - slack))
            val seen = st.seen + 1
            if (s > threshold) {
              alerts += DriftAlert(tpe, e.ts, e.event_id,
                math.round(s * 1e6) / 1e6, seen)
              st = DriftState(0.0, 0L) // sequential restart
            } else st = DriftState(s, seen)
          }
          state.update(st)
          alerts.iterator
      }
  }

  /** Batch face of [[cusumAlertsStream]]: the identical fold over the
    * fully-ordered series (stream ≡ batch is the spec's assertion, so
    * this is deliberately the same code path run as one trigger). */
  def cusumAlertsBatch(events: Dataset[Event], mu0: Double,
      slack: Double, threshold: Double): Dataset[DriftAlert] = {
    import events.sparkSession.implicits._
    require(threshold > 0, "threshold must be positive")
    events.groupByKey(_.event_type).flatMapGroups {
      (tpe: String, it: Iterator[Event]) =>
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var s = 0.0
        var seen = 0L
        val alerts = scala.collection.mutable.ListBuffer[DriftAlert]()
        sorted.foreach { e =>
          s = math.max(0.0, s + (e.value - mu0 - slack))
          seen += 1
          if (s > threshold) {
            alerts += DriftAlert(tpe, e.ts, e.event_id,
              math.round(s * 1e6) / 1e6, seen)
            s = 0.0; seen = 0L
          }
        }
        alerts.iterator
    }
  }

  /** Named accumulator for [[sessionizeStream]]'s divergence count —
    * register once per query; read `.value` after (or during) the
    * run, or watch "graft.sessionize.divergence" in the UI. */
  def lateCloseCounter(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.util.LongAccumulator =
    spark.sparkContext.longAccumulator("graft.sessionize.divergence")

  /** Per-user sessionize state: the open session (0/1-element list)
    * plus the end (epoch millis) of the LAST session this user has
    * already had EMITTED — `Long.MinValue` before any emission. The
    * emitted end is what makes divergence against already-shipped
    * output detectable, not just divergence involving the open
    * session. */
  private[streaming] final case class SessState(open: List[SessionState],
      emittedEnd: Long)

  /** Streaming sessionization with custom state: per-user open-session
    * state, closed and emitted when a later event arrives past the gap
    * OR when the processing-time timeout fires (so the final session of
    * an idle user IS eventually emitted on a live stream).
    *
    * `idleTimeout = false` for BOUNDED runs (`Trigger.AvailableNow`
    * replays, tests): a pending processing-time timeout keeps an
    * AvailableNow query alive waiting for a trigger that never comes —
    * the query NEVER terminates (measured, not theorized). Without the
    * timeout a bounded replay terminates normally and each user's
    * final session simply stays open/unemitted — asserted in the spec.
    * The streaming face of [[sessionizeBatch]].
    *
    * OBSERVABILITY of the residual batch/stream divergence: pass
    * [[lateCloseCounter]] as `divergence` and the fold increments it
    * whenever it does something the batch fold over the full history
    * might not have: (a) a LATE-TIER chain closes (a later trigger
    * could have extended it — the deep-late-split-across-triggers
    * case), (b) an event lands within the gap of a session this
    * user already had EMITTED (the batch fold would have merged into
    * that session; the stream cannot un-emit it) — including events
    * arriving after an idle-timeout emission, which land on a
    * one-horizon TOMBSTONE (open = Nil, emitted end carried) kept
    * past the timeout exactly so this face stays countable before
    * the state is finally dropped — and (c) a late chain that
    * BRIDGES into the open session while its start overlaps emitted
    * output (batch would have merged all three into one row). The
    * counter is an upper bound on divergent sessions: zero means the
    * stream emitted nothing the batch fold wouldn't; nonzero says
    * which runs deserve a batch reconciliation pass. As a named
    * SparkContext accumulator the count surfaces in the Spark UI /
    * listener metrics of a production run without touching the
    * output schema.
    *
    * CHECKPOINT compatibility: the state type changed in r14
    * (List[SessionState] → SessState) — the state-store schema is
    * part of a checkpoint, so a streaming query restarted from a
    * pre-r14 checkpoint fails state-schema validation rather than
    * resume; reset the checkpoint (and reconcile via the batch face)
    * when upgrading. The r15 tombstone reuses SessState unchanged —
    * no new reset needed. */
  def sessionizeStream(events: Dataset[Event], gapSeconds: Long,
      idleTimeout: Boolean = true,
      divergence: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(),
        if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val prior = state.getOption.getOrElse(SessState(Nil, Long.MinValue))
            sessionFoldTimeout(userId, prior) match {
              case (out, Some(next)) =>
                state.update(next)
                state.setTimeoutDuration(gapSeconds * 1000)
                out.iterator
              case (out, None) =>
                state.remove()
                out.iterator
            }
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val prior = state.getOption.getOrElse(SessState(Nil, Long.MinValue))
            val (closed, next) =
              sessionFoldEvents(userId, sorted, prior, gapSeconds, divergence)
            state.update(next)
            if (idleTimeout) state.setTimeoutDuration(gapSeconds * 1000)
            closed.iterator
          }
      }
  }

  /** The idle-timeout transition, pure for testability: with a session
    * open, the gap elapsed with no new events — close and emit it, but
    * keep a TOMBSTONE (open = Nil, emittedEnd carried) for one more
    * timeout horizon, so an event arriving after the timeout but
    * within the gap of the timed-out session lands on
    * [[sessionFoldEvents]]'s overlapsEmitted path and is COUNTED as
    * divergence instead of silently diverging (the r14 blind spot).
    * State stays bounded: the tombstone is one long, and the next
    * timeout with nothing open returns None → remove. */
  private[streaming] def sessionFoldTimeout(userId: Long,
      prior: SessState): (Option[Session], Option[SessState]) =
    prior.open.headOption match {
      case Some(s) =>
        (Some(Session(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.last), s.n.toLong)),
          Some(SessState(Nil, math.max(prior.emittedEnd, s.last))))
      case None => (None, None)
    }

  /** One trigger's fold, pure for testability: sort-ordered events
    * against the prior state → (closed sessions to emit, next state).
    * LATE events (older than the open session) are handled in three
    * tiers, matching sessionizeBatch where bounded state can: within
    * the open session's span-or-gap they MERGE (start moves back via
    * min — a late event must never be silently counted into a session
    * whose [start,last] excludes it); deeper-late events fold into a
    * transient within-trigger chain that either bridges into the open
    * session at trigger end or closes as its own session(s). Residual
    * divergence from batch: a deep-late chain SPLIT ACROSS triggers
    * closes early — the price of not keeping unbounded late state; the
    * `divergence` counter marks it. */
  private[streaming] def sessionFoldEvents(userId: Long,
      sorted: Seq[Event], prior: SessState, gapSeconds: Long,
      divergence: Option[org.apache.spark.util.LongAccumulator])
      : (Seq[Session], SessState) = {
    def emit(s: SessionState): Session =
      Session(userId, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.last), s.n.toLong)
    var open = prior.open.headOption
    var emittedEnd = prior.emittedEnd
    var lateOpen = Option.empty[SessionState]
    val closed = scala.collection.mutable.ListBuffer[Session]()
    def record(s: SessionState): Unit = {
      closed += emit(s)
      emittedEnd = math.max(emittedEnd, s.last)
    }
    // an event time within the gap of the last EMITTED end — batch
    // would have merged it into a session the stream has already
    // shipped (idle-timeout emissions included, via the tombstone)
    def overlapsEmitted(t: Long): Boolean =
      emittedEnd != Long.MinValue &&
        t / 1000 - emittedEnd / 1000 <= gapSeconds
    def closeLate(): Unit = {
      lateOpen.foreach { ls =>
        record(ls)
        divergence.foreach(_.add(1))
      }
      lateOpen = None
    }
    sorted.foreach { e =>
      val t = e.ts.getTime // millis; gap compares truncated seconds
      open match {         // to match sessionizeBatch's unix_timestamp
        case Some(s) if t / 1000 < s.start / 1000 - gapSeconds =>
          // deep-late: belongs to an earlier session entirely
          lateOpen match {
            case Some(ls) if t / 1000 - ls.last / 1000 <= gapSeconds =>
              lateOpen = Some(ls.copy(last = math.max(ls.last, t),
                n = ls.n + 1))
            case Some(_) =>
              closeLate() // chain rollover: the old chain is final
              lateOpen = Some(SessionState(t, t, 1))
            case None => lateOpen = Some(SessionState(t, t, 1))
          }
        case Some(s) if t / 1000 - s.last / 1000 <= gapSeconds =>
          // min()/max(): a late event from a previous trigger must
          // move the session START back, not vanish into a span that
          // excludes it; a late one must not move the end backwards. A
          // back-extension that reaches into the gap of
          // already-EMITTED output is the other divergence face —
          // count it (the batch fold would have merged; the emitted
          // row is already out)
          if (t < s.start && overlapsEmitted(t))
            divergence.foreach(_.add(1))
          open = Some(s.copy(start = math.min(s.start, t),
            last = math.max(s.last, t), n = s.n + 1))
        case Some(s) =>
          closeLate() // the late chain predates s — emit in order
          record(s)
          open = Some(SessionState(t, t, 1))
        case None =>
          if (overlapsEmitted(t)) divergence.foreach(_.add(1))
          open = Some(SessionState(t, t, 1))
      }
    }
    // trigger end: a late chain that now reaches within the gap of the
    // open session's start BRIDGES into it (batch would see one
    // session); otherwise it closes. A bridging chain whose START
    // falls within the gap of an already-EMITTED session is the third
    // divergence face: batch would have merged the emitted session,
    // this chain and the open one into ONE row, but the emitted row is
    // already shipped — count it (the r14 counter missed exactly this,
    // leaving 'counter = 0' claims false for bridged late chains).
    (lateOpen, open) match {
      case (Some(ls), Some(s))
          if s.start / 1000 - ls.last / 1000 <= gapSeconds =>
        if (overlapsEmitted(ls.start)) divergence.foreach(_.add(1))
        open = Some(s.copy(start = math.min(s.start, ls.start),
          n = s.n + ls.n))
        lateOpen = None
      case _ => closeLate()
    }
    (closed.toSeq, SessState(open.toList, emittedEnd))
  }
}
