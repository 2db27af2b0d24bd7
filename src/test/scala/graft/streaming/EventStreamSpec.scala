package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** events via the one shared loader (handles both fixture
    * generations); streaming windows want a TZ-anchored TIMESTAMP. */
  private lazy val events = graft.Tables.events(spark, TestSpark.sf)
    .withColumn("ts", col("ts").cast("timestamp"))
    .select("event_id", "ts", "user_id", "event_type", "value")

  test("streaming windowed agg over AvailableNow equals the batch plan") {
    val dir = Files.createTempDirectory("events_stream").toString
    events.write.mode("overwrite").parquet(dir)
    // Complete mode: the bounded replay must surface ALL windows for
    // the batch-parity check (Append would hold back windows not yet
    // past the watermark); production streams use the Append default
    val q = EventStream.windowedCountsStream(spark, dir, events,
      "1 hour", "10 minutes", "win_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    q.awaitTermination(120000)
    val streamed = spark.table("win_test")
      .select("w_start", "event_type", "cnt")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStream.windowedCounts(events, "1 hour")
      .select("w_start", "event_type", "cnt")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("streaming dedup drops watermark-window replays, keeps one row per key") {
    val dir = Files.createTempDirectory("events_dup").toString
    // every event written twice — an at-least-once source replay.
    // filter, not limit: two bare limit(500) subtrees may pick
    // DIFFERENT rows (no ordering guarantee), breaking the doubling
    val half = events.filter($"event_id" < 500)
    assert(half.count() === 500)
    half.unionByName(half).write.mode("overwrite").parquet(dir)
    val q = EventStream.dedupStreamQuery(spark, dir, events,
      idCols = Seq("event_id"), tsCol = "ts", watermark = "1 hour",
      queryName = "dedup_test")
    assert(q.awaitTermination(120000), "streaming query timed out")
    val out = spark.table("dedup_test")
    assert(out.count() === 500, "each replayed event must survive exactly once")
    assert(out.select("event_id").distinct().count() === 500)
  }

  test("stream-static enrichment equals the batch broadcast join") {
    val dir = Files.createTempDirectory("events_enrich").toString
    events.write.mode("overwrite").parquet(dir)
    val dim = spark.range(0, 1000)
      .select($"id".as("user_id"),
        concat(lit("seg-"), ($"id" % 7).cast("string")).as("segment"))
    val q = EventStream.enrichStream(spark, dir, events, dim,
      "user_id", "enrich_test")
    q.awaitTermination(120000)
    val streamed = spark.table("enrich_test")
      .select("event_id", "segment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = events.join(dim, Seq("user_id"))
      .select("event_id", "segment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream interval join equals the batch interval join") {
    val clicks = events.filter($"event_type" === "click")
    val purchases = events.filter($"event_type" === "purchase")
    val lDir = Files.createTempDirectory("ss_clicks").toString
    val rDir = Files.createTempDirectory("ss_purch").toString
    clicks.write.mode("overwrite").parquet(lDir)
    purchases.write.mode("overwrite").parquet(rDir)
    val q = EventStream.intervalJoinStreams(spark, lDir, rDir, events,
      "user_id", windowSeconds = 3600L, watermark = "10 minutes",
      "ssjoin_test")
    assert(q.awaitTermination(180000), "streaming query timed out")
    val streamed = spark.table("ssjoin_test")
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = clicks.select($"user_id", $"ts".as("l_ts"), $"event_id".as("l_id"))
      .join(purchases.select($"user_id", $"ts".as("r_ts"), $"event_id".as("r_id")),
        Seq("user_id"))
      .filter($"r_ts" >= $"l_ts" && $"r_ts" <= $"l_ts" + expr("INTERVAL 3600 SECONDS"))
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture should produce at least one attribution pair")
    assert(streamed === batch)
  }

  test("attribution face: the 7-day stream-stream interval join feeds " +
      "q205's aggregate — stream equals batch channel-for-channel") {
    // q205's conversions × lookback-clicks shape as a REAL watermarked
    // stream-stream join: clicks and purchases arrive as two streams,
    // state is evicted by the watermark + time bound, and the joined
    // pairs feed the SAME attribution aggregate as the batch query
    val ev = graft.Tables.events(spark, TestSpark.sf)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val lDir = Files.createTempDirectory("attr_clicks").toString
    val rDir = Files.createTempDirectory("attr_purch").toString
    ev.filter($"event_type" === "click").write.mode("overwrite").parquet(lDir)
    ev.filter($"event_type" === "purchase").write.mode("overwrite").parquet(rDir)
    val q = EventStream.intervalJoinStreams(spark, lDir, rDir, ev,
      "user_id", windowSeconds = 7L * 86400, watermark = "1 hour",
      "attrib7_test")
    assert(q.awaitTermination(180000), "attribution stream timed out")
    // the interval join's closed lower bound admits the measure-zero
    // cts == pts − 7d boundary q205 excludes — apply the strict bound
    val pairs = spark.table("attrib7_test")
      .filter($"l_ts" > $"r_ts" - expr("INTERVAL 7 DAYS"))
      .select($"l_id".as("cid"), $"r_id".as("pid"),
        $"l_ts".as("cts"), $"r_ts".as("pts"))
    val batchPairs = graft.Queries.attributionPairs(ev)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("cid", "pid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(batchPairs).nonEmpty)
    assert(pairSet(pairs) === pairSet(batchPairs))
    // end-to-end: enrich the streamed pairs (channel from the click
    // row, value from the conversion row — deterministic id joins)
    // and run the identical aggregate phase
    val joined = pairs
      .join(graft.Queries.attributionClicks(ev).select("cid", "channel"),
        Seq("cid"))
      .join(graft.Queries.attributionConversions(ev).select("pid", "value"),
        Seq("pid"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val got = rows(graft.Queries.attributionAggregate(joined))
    val want = rows(graft.Queries.attributionAggregate(batchPairs))
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("batch sessionization: sessions partition each user's events") {
    val sessions = EventStream.sessionizeBatch(events, gapSeconds = 3600)
    val totalEvents = sessions.agg(sum($"n_events")).head.getLong(0)
    assert(totalEvents === events.count())
    // session bounds are consistent
    assert(sessions.filter($"session_end" < $"session_start").count() === 0)
    // gap property: consecutive sessions of a user are > gap apart
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"session_start")
    val viol = sessions.withColumn("prev_end", lag($"session_end", 1).over(w))
      .filter($"prev_end".isNotNull &&
        unix_timestamp($"session_start") - unix_timestamp($"prev_end") <= 3600)
    assert(viol.count() === 0)
  }

  test("native session_window: streaming face equals batch face") {
    val dir = Files.createTempDirectory("events_sw").toString
    events.write.mode("overwrite").parquet(dir)
    // Complete mode surfaces sessions not yet past the watermark on a
    // bounded replay (same rationale as the windowed-agg test)
    val q = EventStream.sessionizeNativeStream(spark, dir, events,
      gapSeconds = 3600, watermark = "10 minutes", "sw_test",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    assert(q.awaitTermination(180000), "streaming query timed out")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "session_start", "session_end", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    val streamed = canon(spark.table("sw_test"))
    val batch = canon(EventStream.sessionizeNative(events, 3600))
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }

  test("native session_window face: event count conserved, gap property holds") {
    val sessions = EventStream.sessionizeNative(events, gapSeconds = 3600)
    assert(sessions.agg(sum($"n_events")).head.getLong(0) === events.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"session_start")
    // strict-gap semantics: next session starts >= prev end (= last_ts + gap)
    val viol = sessions.withColumn("prev_end", lag($"session_end", 1).over(w))
      .filter($"prev_end".isNotNull && $"session_start" < $"prev_end")
    assert(viol.count() === 0)
  }

  test("streaming heavy hitters: sketch recall guarantee holds per group") {
    val dir = Files.createTempDirectory("events_hh").toString
    events.write.mode("overwrite").parquet(dir)
    val capacity = 15
    val q = EventStream.heavyHittersStream(spark, dir, events,
      "event_type", "user_id", capacity, "hh_test")
    assert(q.awaitTermination(180000), "streaming query timed out")
    val sketched = spark.table("hh_test")
      .select($"event_type", explode($"sketch").as("s"))
      .select($"event_type", $"s.item".cast("long").as("item"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // every item with true frequency > N/(capacity+1) must be a candidate
    val guaranteed = events.groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("n"))
      .join(events.groupBy($"event_type").agg(count(lit(1)).as("total")),
        Seq("event_type"))
      .filter($"n" > $"total" / (capacity + 1))
      .select($"event_type", $"user_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(guaranteed.subsetOf(sketched),
      s"missing guaranteed heavy hitters: ${guaranteed -- sketched}")
  }

  test("streaming bounded top-k equals the batch aggregate") {
    val dir = Files.createTempDirectory("events_topk").toString
    events.write.mode("overwrite").parquet(dir)
    val q = EventStream.topKStream(spark, dir, events,
      "event_type", "value", k = 3, "topk_test")
    assert(q.awaitTermination(120000), "streaming query timed out")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val streamed = canon(spark.table("topk_test"))
    val batch = canon(events.groupBy($"event_type")
      .agg(graft.functions.bounded_topk($"value", 3).as("topk")))
    assert(streamed === batch)
    assert(streamed.nonEmpty && streamed.values.forall(_.length === 3))
  }

  test("streaming CUSUM drift: two-wave replay carries state and equals the batch fold") {
    import EventStream.{Event, DriftAlert}
    def ev(id: Long, sec: Long, tpe: String, v: Double) =
      Event(id, new java.sql.Timestamp(sec * 1000), 1L, tpe, v)
    // μ0=5, slack=0, h=6.
    // type m: alert inside wave 1 (ts4, S=8, n=4) and inside wave 2 (ts7, S=8, n=3)
    // type c: S reaches exactly 6 in wave 1 (no alert: 6 !> 6); wave 2's
    //   single event pushes the CARRIED state to 9 → alert with
    //   n_since_reset=3 — impossible if the restart lost state
    val wave1 = Seq(
      ev(1, 1, "m", 5), ev(2, 2, "m", 5), ev(3, 3, "m", 9), ev(4, 4, "m", 9),
      ev(101, 1, "c", 8), ev(102, 2, "c", 8))
    val wave2 = Seq(
      ev(5, 5, "m", 9), ev(6, 6, "m", 5), ev(7, 7, "m", 9), ev(8, 8, "m", 9),
      ev(103, 3, "c", 8))
    val tmp = Files.createTempDirectory("cusum_stream").toString
    val src = s"$tmp/src"; val sink = s"$tmp/alerts"; val ck = s"$tmp/ck"
    def runWave(ws: Seq[Event]): Unit = {
      ws.toDS().write.mode("append").parquet(src)
      val q = EventStream.cusumAlertsStream(
          spark.readStream.schema(wave1.toDS().schema).parquet(src)
            .as[Event], mu0 = 5.0, slack = 0.0, threshold = 6.0)
        .writeStream
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "streaming query timed out")
    }
    runWave(wave1)
    runWave(wave2)
    def canon(alerts: Seq[DriftAlert]) = alerts
      .map(a => (a.event_type, a.ts.getTime / 1000, a.event_id, a.stat,
        a.n_since_reset)).toSet
    val streamed = canon(spark.read.parquet(sink).as[DriftAlert].collect().toSeq)
    val batch = canon(EventStream.cusumAlertsBatch(
      (wave1 ++ wave2).toDS(), 5.0, 0.0, 6.0).collect().toSeq)
    assert(streamed === batch)
    assert(streamed === Set(
      ("m", 4L, 4L, 8.0, 4L), ("m", 7L, 7L, 8.0, 3L),
      ("c", 3L, 103L, 9.0, 3L)))
  }

  test("late events across triggers: in-gap ones extend the session START, " +
      "deep-late ones form their own session — never a distorted span") {
    import EventStream.{Event, Session}
    def ev(id: Long, sec: Long) =
      Event(id, new java.sql.Timestamp(sec * 1000), 7L, "click", 0.0)
    // gap 60 s. Wave 1 opens a session at t=36000. Wave 2 delivers:
    //  - 35970 (late but within the gap BEFORE the start → must MERGE
    //    and move session_start back, not vanish inside [36000, ...])
    //  - 28800, 28830 (deep-late chain → their own 2-event session)
    //  - 36030 (normal continuation)
    val wave1 = Seq(ev(1, 36000))
    val wave2 = Seq(ev(2, 35970), ev(3, 28800), ev(4, 28830), ev(5, 36030))
    val tmp = Files.createTempDirectory("sess_late").toString
    val src = s"$tmp/src"; val sink = s"$tmp/sessions"; val ck = s"$tmp/ck"
    def runWave(ws: Seq[Event]): Unit = {
      ws.toDS().write.mode("append").parquet(src)
      // idleTimeout = false: a pending processing-time timeout keeps
      // an AvailableNow query alive forever (see sessionizeStream doc)
      val q = EventStream.sessionizeStream(
          spark.readStream.schema(wave1.toDS().schema).parquet(src)
            .as[Event], gapSeconds = 60, idleTimeout = false)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "streaming query timed out")
    }
    runWave(wave1)
    runWave(wave2)
    val closedSessions = spark.read.parquet(sink).as[Session].collect()
      .map(s => (s.session_start.getTime / 1000, s.session_end.getTime / 1000,
        s.n_events)).toSet
    // only the deep-late chain closes (the live session stays open on
    // a bounded replay); it must be exactly the 2-event 28800–28830
    // span — NOT merged into the 36000 session, NOT two singletons
    assert(closedSessions === Set((28800L, 28830L, 2L)),
      s"deep-late chain mishandled: $closedSessions")
    // drive one more event past the gap to flush the live session:
    // its start must have moved BACK to the in-gap late event
    runWave(Seq(ev(6, 40000)))
    val after = spark.read.parquet(sink).as[Session].collect()
      .map(s => (s.session_start.getTime / 1000, s.session_end.getTime / 1000,
        s.n_events)).toSet
    assert(after.contains((35970L, 36030L, 3L)),
      s"in-gap late event must extend session_start: $after")
  }

  test("late-chain closures are counted: the batch/stream divergence is observable") {
    import EventStream.{Event, Session}
    def ev(id: Long, sec: Long) =
      Event(id, new java.sql.Timestamp(sec * 1000), 9L, "click", 0.0)
    // gap 60 s. Wave 1 opens at 36000. Wave 2's deep-late chain
    // (28800, 28830) closes at trigger end — counter fires once.
    // Wave 3 delivers 28890, IN-GAP of the closed chain: batch over
    // all events would emit ONE 28800–28890 session, the stream
    // already closed 28800–28830 and now closes 28890 as its own —
    // the documented divergence, and the counter must have marked
    // every such closure.
    val wave1 = Seq(ev(1, 36000))
    val wave2 = Seq(ev(2, 28800), ev(3, 28830))
    val wave3 = Seq(ev(4, 28890))
    val tmp = Files.createTempDirectory("sess_ctr").toString
    val src = s"$tmp/src"; val sink = s"$tmp/sessions"; val ck = s"$tmp/ck"
    val counter = EventStream.lateCloseCounter(spark)
    def runWave(ws: Seq[Event]): Unit = {
      ws.toDS().write.mode("append").parquet(src)
      val q = EventStream.sessionizeStream(
          spark.readStream.schema(wave1.toDS().schema).parquet(src)
            .as[Event], gapSeconds = 60, idleTimeout = false,
          divergence = Some(counter))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "streaming query timed out")
    }
    runWave(wave1)
    assert(counter.value === 0, "no late events yet — counter must be silent")
    runWave(wave2)
    assert(counter.value === 1,
      s"one deep-late chain closed at trigger end, counter=${counter.value}")
    runWave(wave3)
    assert(counter.value === 2,
      s"the split-across-triggers closure must be counted too: ${counter.value}")
    // and the divergence the counter flags is real: two sessions where
    // the batch fold over the same events would emit one
    val late = spark.read.parquet(sink).as[Session].collect()
      .filter(_.session_start.getTime < 36000 * 1000L)
      .map(s => (s.session_start.getTime / 1000,
        s.session_end.getTime / 1000, s.n_events)).toSet
    assert(late === Set((28800L, 28830L, 2L), (28890L, 28890L, 1L)),
      s"expected the early-closed chain plus the orphan: $late")
  }

  test("divergence counter also marks back-extensions into already-emitted output") {
    import EventStream.{Event, Session}
    def ev(id: Long, sec: Long) =
      Event(id, new java.sql.Timestamp(sec * 1000), 11L, "click", 0.0)
    // gap 60 s. Trigger 1 delivers 100, 140, 250: the stream EMITS
    // [100,140] and holds [250] open. Trigger 2 delivers 190 — in-gap
    // of the open session (250−190 = 60), so it back-extends the open
    // session... but 190 is ALSO within the gap of the emitted 140:
    // batch over {100,140,190,250} emits ONE [100,250] session. The
    // stream cannot un-emit [100,140] — the counter must mark it.
    val wave1 = Seq(ev(1, 100), ev(2, 140), ev(3, 250))
    val wave2 = Seq(ev(4, 190))
    val tmp = Files.createTempDirectory("sess_backext").toString
    val src = s"$tmp/src"; val sink = s"$tmp/sessions"; val ck = s"$tmp/ck"
    val counter = EventStream.lateCloseCounter(spark)
    def runWave(ws: Seq[Event]): Unit = {
      ws.toDS().write.mode("append").parquet(src)
      val q = EventStream.sessionizeStream(
          spark.readStream.schema(wave1.toDS().schema).parquet(src)
            .as[Event], gapSeconds = 60, idleTimeout = false,
          divergence = Some(counter))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "streaming query timed out")
    }
    runWave(wave1)
    assert(counter.value === 0,
      "within-trigger rollover is batch-equivalent at that point in time")
    runWave(wave2)
    assert(counter.value === 1,
      s"the back-extension into emitted output must be counted: ${counter.value}")
    // the stream's output is genuinely divergent here — [100,140] is
    // already out while the open session now spans [190,250]
    val emitted = spark.read.parquet(sink).as[Session].collect()
      .map(s => (s.session_start.getTime / 1000,
        s.session_end.getTime / 1000, s.n_events)).toSet
    assert(emitted === Set((100L, 140L, 2L)), s"unexpected emissions: $emitted")
  }

  test("streaming sessionization with custom state emits closed sessions") {
    val ds = events.as[EventStream.Event]
    // batch Dataset works through the same flatMapGroupsWithState code
    // path (batch execution: every group sees all its events, state
    // discarded) — closed sessions = all but each user's last open one.
    val sessions = EventStream.sessionizeStream(ds, gapSeconds = 3600).collect()
    val batchSessions = EventStream.sessionizeBatch(events, 3600)
    val users = events.select("user_id").distinct().count()
    assert(sessions.length === batchSessions.count() - users) // last session per user stays open
    // every emitted closed session matches a batch session (compared at
    // second granularity — the custom state keeps millis, batch micros)
    val batchSet = batchSessions
      .select("user_id", "session_start", "n_events")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000, r.getLong(2)))
      .toSet
    assert(sessions.forall(s =>
      batchSet.contains((s.user_id, s.session_start.getTime / 1000, s.n_events))))
  }

  test("streaming SCD2 enrichment equals the batch as-of join") {
    import java.sql.Timestamp
    val dir = Files.createTempDirectory("events_scd").toString
    events.write.mode("overwrite").parquet(dir)
    val span = events.agg(min($"ts"), max($"ts")).head()
    val t0 = span.getTimestamp(0); val mid =
      new Timestamp((span.getTimestamp(0).getTime + span.getTimestamp(1).getTime) / 2)
    // even users: two episodes (bronze from t0, gold from mid); odd
    // users: ONE episode starting at mid — their pre-mid events hit
    // the no-episode-yet path; users ≥ 500 absent — unknown-key path
    val log = spark.range(0, 500).select($"id".as("user_id"))
      .flatMap { r =>
        val u = r.getLong(0)
        if (u % 2 == 0) Seq((u, "bronze", t0), (u, "gold", mid))
        else Seq((u, "gold", mid))
      }.toDF("user_id", "segment", "chg_ts")
    val scd = graft.etl.Scd.scd2FromChangeLog(log,
      keyCols = Seq("user_id"), attrCols = Seq("segment"),
      orderCols = Seq("chg_ts"))
    val q = EventStream.scdEnrichStream(spark, dir, events, scd,
      key = "user_id", ts = "ts", attrs = Seq("segment", "version"),
      queryName = "scd_enrich_test")
    assert(q.awaitTermination(120000), "streaming query timed out")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("event_id", "segment", "version").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val streamed = canon(spark.table("scd_enrich_test"))
    val batch = canon(graft.operators.AsOfJoin.asOf(
      events,
      scd.select($"user_id", $"valid_from".as("ts"), $"segment", $"version"),
      key = "user_id", ts = "ts", carry = Seq("segment", "version"),
      rightTieBreak = "version"))
    assert(streamed === batch)
    // all three match regimes must actually occur in the fixture
    assert(streamed.exists(_._2 == "bronze"))
    assert(streamed.exists(_._2 == "gold"))
    assert(streamed.exists(_._2 == null), "null-carry rows must survive")
  }

  test("foreachBatch as-of enrichment: checkpointed restart processes only new files") {
    val tmp = Files.createTempDirectory("asof_stream").toString
    val src = s"$tmp/src"; val sink = s"$tmp/out"; val ck = s"$tmp/ck"
    def ev(id: Long, sec: Long, u: Long) =
      EventStream.Event(id, new java.sql.Timestamp(sec * 1000), u, "x", 0.0)
    val wave1 = Seq(ev(1, 10, 1), ev(2, 20, 1), ev(3, 15, 2))
    val wave2 = Seq(ev(4, 25, 1), ev(5, 5, 2), ev(6, 30, 3))
    // quote history: NOT episode-closed — the general-as-of case
    val quotes = Seq((1L, 10L, 1.0), (1L, 22L, 2.0), (2L, 12L, 3.0))
      .map { case (k, s, p) => (k, new java.sql.Timestamp(s * 1000), p, s) }
      .toDF("user_id", "ts", "px", "seq")
    def run(ws: Seq[EventStream.Event]): Unit = {
      if (ws.nonEmpty) ws.toDS().write.mode("append").parquet(src)
      val q = EventStream.asOfEnrichForeachBatch(spark, src,
        wave1.toDS().toDF(), quotes, key = "user_id", ts = "ts",
        carry = Seq("px"), rightTieBreak = "seq", sinkDir = sink,
        checkpointDir = ck)
      assert(q.awaitTermination(120000), "streaming query timed out")
    }
    run(wave1)
    run(wave2)
    val out = spark.read.parquet(sink)
    // restart touched only the new files → a second batch partition,
    // and wave1 rows appear exactly once
    assert(out.select("batch_id").distinct().count() === 2)
    // null carry → sentinel, not NaN: scala tuple equality on NaN is
    // always false (BoxesRunTime compares via primitive ==)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("event_id", "px").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -999.0 else r.getDouble(1))).toSet
    val batch = canon(graft.operators.AsOfJoin.asOf(
      (wave1 ++ wave2).toDS().toDF(), quotes, key = "user_id", ts = "ts",
      carry = Seq("px"), rightTieBreak = "seq"))
    assert(canon(out) === batch)
    assert(batch === Set((1L, 1.0), (2L, 1.0), (3L, 3.0), (4L, 2.0),
      (5L, -999.0), (6L, -999.0)))
    // a third AvailableNow run with NO new source data must be a no-op
    run(Nil)
    assert(spark.read.parquet(sink).count() === 6)
    assert(spark.read.parquet(sink).select("batch_id").distinct().count() === 2)
  }

  test("as-of enrichment sink compaction folds committed partitions, reader unchanged") {
    val tmp = Files.createTempDirectory("asof_compact").toString
    val src = s"$tmp/src"; val sink = s"$tmp/out"; val ck = s"$tmp/ck"
    def ev(id: Long, sec: Long, u: Long) =
      EventStream.Event(id, new java.sql.Timestamp(sec * 1000), u, "x", 0.0)
    val quotes = Seq((1L, 10L, 1.0), (1L, 22L, 2.0), (2L, 12L, 3.0))
      .map { case (k, s, p) => (k, new java.sql.Timestamp(s * 1000), p, s) }
      .toDF("user_id", "ts", "px", "seq")
    val waves = Seq(
      Seq(ev(1, 10, 1), ev(2, 20, 1)),
      Seq(ev(3, 15, 2)),
      Seq(ev(4, 25, 1), ev(5, 5, 2)),
      Seq(ev(6, 30, 3)))
    waves.foreach { w =>
      w.toDS().write.mode("append").parquet(src)
      val q = EventStream.asOfEnrichForeachBatch(spark, src,
        waves.head.toDS().toDF(), quotes, key = "user_id", ts = "ts",
        carry = Seq("px"), rightTieBreak = "seq", sinkDir = sink,
        checkpointDir = ck, compactEvery = 2)
      assert(q.awaitTermination(120000), "streaming query timed out")
    }
    val dirs = new java.io.File(sink).listFiles().filter(_.isDirectory)
      .map(_.getName).filterNot(_.startsWith("_")).toSet
    // batches 0..3: batch 2 folds {0,1} into gen=0; batch 3 sees only
    // {2} committed (< minBatches) — steady state is bounded, not
    // one-directory-per-batch
    assert(dirs.exists(_.startsWith("gen=")), s"no generation in $dirs")
    assert(dirs.count(_.startsWith("batch_id=")) <= 2, s"unfolded: $dirs")
    val out = EventStream.enriched(spark, sink,
      spark.read.parquet(s"$sink/${dirs.head}"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("event_id", "px").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -999.0 else r.getDouble(1))).toSet
    val batch = canon(graft.operators.AsOfJoin.asOf(
      waves.flatten.toDS().toDF(), quotes, key = "user_id", ts = "ts",
      carry = Seq("px"), rightTieBreak = "seq"))
    assert(canon(out) === batch)
    assert(out.count() === 6)
  }

  test("SinkFold: tiered folding bounds live generations, rows conserved") {
    val tmp = Files.createTempDirectory("sinkfold_tiered").toString
    val sink = s"$tmp/out"
    val rows = (0L until 6L).map(i => (i, s"v$i")).toDF("id", "v")
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dirNames() = fs.listStatus(new org.apache.hadoop.fs.Path(sink))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    // three batch→fold rounds at maxGenerations = 2: the third fold
    // must absorb the smallest live generation (byte tie between
    // gen=0 and gen=1 → the id tiebreak picks gen=0) into gen=2
    (0 until 3).foreach { b =>
      rows.filter($"id" === 2 * b || $"id" === 2 * b + 1)
        .write.parquet(s"$sink/batch_id=$b")
      SinkFold.fold(spark, sink, rows, beforeBatchId = b + 1L,
        minBatches = 1, maxGenerations = 2)
    }
    assert(dirNames().filter(_.startsWith("gen=")) === Set("gen=1", "gen=2"))
    assert(!dirNames().exists(_.startsWith("batch_id=")))
    assert(Manifests.readManifest(fs,
        new org.apache.hadoop.fs.Path(s"$sink/gen=2"))
      === Set("gen=0", "batch_id=2"))
    assert(SinkFold.read(spark, sink, rows).select("id").collect()
      .map(_.getLong(0)).toSet === (0L until 6L).toSet)
  }

  test("SinkFold: manifest supersedes a source that survived a crash-window") {
    val tmp = Files.createTempDirectory("sinkfold_crash").toString
    val sink = s"$tmp/out"
    val rows = (0L until 4L).map(i => (i, s"v$i")).toDF("id", "v")
    // three committed batch partitions
    (0 until 3).foreach(b => rows.filter($"id" === b)
      .write.parquet(s"$sink/batch_id=$b"))
    val gen = SinkFold.fold(spark, sink, rows, beforeBatchId = 3,
      minBatches = 2)
    assert(gen === Some(0L))
    assert(SinkFold.read(spark, sink, rows).count() === 3)
    // crash window: a folded source reappears on disk (fold published
    // its manifest but died before deleting sources) — the manifest
    // must supersede it in every listing, and the next fold GCs it.
    // In a real crash the source PREDATES its generation (the fold
    // reads sources before publishing), so backdate the recreated
    // directory to the real ordering — the GC's mtime guard only
    // reaps sources older than their generation.
    rows.filter($"id" === 1).write.mode("overwrite")
      .parquet(s"$sink/batch_id=1")
    val genMtime = new java.io.File(s"$sink/gen=0").lastModified()
    assert(new java.io.File(s"$sink/batch_id=1")
      .setLastModified(genMtime - 60000))
    assert(SinkFold.read(spark, sink, rows).count() === 3,
      "manifested source must not double-count")
    SinkFold.fold(spark, sink, rows, beforeBatchId = 100, minBatches = 99)
    assert(!new java.io.File(s"$sink/batch_id=1").exists(),
      "GC must delete the manifested source")
    assert(SinkFold.read(spark, sink, rows).count() === 3)
  }

  test("SinkFold: GC never reaps a source NEWER than its generation " +
      "(fresh-checkpoint misuse loses no data)") {
    val tmp = Files.createTempDirectory("sinkfold_fresh").toString
    val sink = s"$tmp/out"
    val rows = (0L until 4L).map(i => (i, s"v$i")).toDF("id", "v")
    (0 until 3).foreach(b => rows.filter($"id" === b)
      .write.parquet(s"$sink/batch_id=$b"))
    assert(SinkFold.fold(spark, sink, rows, beforeBatchId = 3,
      minBatches = 2) === Some(0L))
    // a sink wrongly reused with a NEW checkpoint: batch ids restart
    // at 0 and a fresh batch_id=1 lands with a POST-generation mtime.
    // The old manifest names it, but GC must not delete fresh data —
    // and a later fold must not re-fold the manifested name either.
    rows.filter($"id" === 3).write.mode("overwrite")
      .parquet(s"$sink/batch_id=1")
    SinkFold.fold(spark, sink, rows, beforeBatchId = 100, minBatches = 99)
    assert(new java.io.File(s"$sink/batch_id=1").exists(),
      "GC reaped a source newer than its generation")
  }

  test("SinkFold: non-conforming directory names are ignored, not parsed") {
    val tmp = Files.createTempDirectory("sinkfold_stray").toString
    val sink = s"$tmp/out"
    val rows = (0L until 4L).map(i => (i, s"v$i")).toDF("id", "v")
    (0 until 2).foreach(b => rows.filter($"id" === b)
      .write.parquet(s"$sink/batch_id=$b"))
    // a manual backup copy must neither crash the id parse nor be
    // read as a partition
    rows.filter($"id" === 2).write.parquet(s"$sink/batch_id=1.bak")
    assert(SinkFold.read(spark, sink, rows).count() === 2,
      "stray dir must not be read as a partition")
    assert(SinkFold.fold(spark, sink, rows, beforeBatchId = 2,
      minBatches = 2) === Some(0L))
    assert(SinkFold.read(spark, sink, rows).count() === 2)
    assert(new java.io.File(s"$sink/batch_id=1.bak").exists(),
      "stray dir must be left alone")
  }

  test("idle-timeout tombstone: an event after the timeout is counted, then the tombstone expires") {
    import EventStream.{Event, SessState, SessionState}
    val acc = spark.sparkContext.longAccumulator
    // a session [100,140] is open when the idle timeout fires: it is
    // emitted, and the state becomes a TOMBSTONE carrying the emitted
    // end instead of being removed
    val (out1, st1) = EventStream.sessionFoldTimeout(7L,
      SessState(List(SessionState(100000L, 140000L, 2)), Long.MinValue))
    assert(out1.map(s => (s.session_start.getTime / 1000,
      s.session_end.getTime / 1000, s.n_events)) === Some((100L, 140L, 2L)))
    assert(st1 === Some(SessState(Nil, 140000L)))
    // an event at 190 s — within the 60 s gap of the timed-out session:
    // batch would have merged it; the stream already shipped [100,140].
    // The tombstone makes this COUNTABLE (the r14 blind spot).
    def ev(id: Long, sec: Long) =
      Event(id, new java.sql.Timestamp(sec * 1000), 7L, "click", 0.0)
    val (out2, st2) = EventStream.sessionFoldEvents(7L, Seq(ev(1, 190)),
      st1.get, gapSeconds = 60, divergence = Some(acc))
    assert(acc.value === 1, "post-timeout in-gap event must be counted")
    assert(out2.isEmpty && st2.open.map(_.start) === List(190000L))
    // a second timeout with nothing open drops the tombstone — state
    // stays bounded
    assert(EventStream.sessionFoldTimeout(7L, SessState(Nil, 140000L))
      === ((None, None)))
  }

  test("a bridging late chain that overlaps emitted output is counted as divergence") {
    import EventStream.{Event, SessState, SessionState}
    def ev(id: Long, sec: Long) =
      Event(id, new java.sql.Timestamp(sec * 1000), 7L, "click", 0.0)
    // gap 60 s. Emitted [100,140]; open [300,300]. The trigger delivers
    // 190 (deep-late, starts a chain) and 250 (back-extends the open
    // session). At trigger end the chain [190,190] BRIDGES into the
    // open session (250-190 = 60) — batch over the full history emits
    // ONE [100,300] session, but [100,140] is already shipped: the
    // bridge branch must count the divergence (the r14 counter's
    // uncounted face).
    val acc = spark.sparkContext.longAccumulator
    val prior = SessState(List(SessionState(300000L, 300000L, 1)), 140000L)
    val (out, st) = EventStream.sessionFoldEvents(7L,
      Seq(ev(1, 190), ev(2, 250)), prior, gapSeconds = 60,
      divergence = Some(acc))
    assert(out.isEmpty, "the merged session stays open")
    assert(st.open.map(s => (s.start, s.last, s.n))
      === List((190000L, 300000L, 3)))
    assert(acc.value === 1,
      s"bridge-into-emitted must be counted, got ${acc.value}")
    // control: the same shape with the emitted session far in the past
    // (no overlap) must NOT count
    val acc2 = spark.sparkContext.longAccumulator
    val (_, _) = EventStream.sessionFoldEvents(7L,
      Seq(ev(1, 190), ev(2, 250)),
      SessState(List(SessionState(300000L, 300000L, 1)), 20000L),
      gapSeconds = 60, divergence = Some(acc2))
    assert(acc2.value === 0,
      s"non-overlapping bridge is batch-equivalent, got ${acc2.value}")
  }
}
