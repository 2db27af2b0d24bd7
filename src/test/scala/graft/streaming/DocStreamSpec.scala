package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup ingestion: greedy first-wins semantics, batch
  * parity on CC-equivalent graphs, chain divergence pinned, and
  * checkpointed-restart idempotence. */
class DocStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDirs() = {
    val src = Files.createTempDirectory("docstream_src").toString
    val sink = Files.createTempDirectory("docstream_sink").toString
    val cp = Files.createTempDirectory("docstream_cp").toString
    (src, sink, cp)
  }

  private def run(src: String, sink: String, cp: String, name: String,
      schemaFrom: org.apache.spark.sql.DataFrame): Unit = {
    val q = DocStream.nearDupIngestStream(spark, src, schemaFrom,
      "doc_id", "text", threshold = 0.9, sink, name, Some(cp))
    assert(q.awaitTermination(180000), s"stream $name timed out")
  }

  test("fixture corpus in one batch equals the offline CC dedup") {
    val docs = TestSpark.table("documents").select("doc_id", "text")
    val (src, sink, cp) = freshDirs()
    docs.write.mode("overwrite").parquet(src)
    run(src, sink, cp, "docstream_one", docs)
    val got = DocStream.accepted(spark, sink, docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = Dedup.dropNearDups(docs, "doc_id",
      Dedup.nearDupPairs(docs, "doc_id", "text", 0.9))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    assert(got.size < docs.count())
  }

  test("cross-batch: later near-dups of accepted docs are rejected") {
    // batch 1: originals; batch 2: one near-identical copy + one fresh
    val b1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val b2 = Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (12L, "completely different words appear in this document here now")
    ).toDF("doc_id", "text")
    val (src, sink, cp) = freshDirs()
    b1.write.mode("overwrite").parquet(s"$src/f1")
    run(s"$src/f1", sink, cp, "docstream_cross", b1)
    b2.write.mode("append").parquet(s"$src/f1") // same glob dir: new files
    run(s"$src/f1", sink, cp, "docstream_cross", b1)
    val got = DocStream.accepted(spark, sink, b1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 12L))
  }

  test("chain across batches diverges from CC by design: tail survives") {
    // a (accepted) — b (dup of a, rejected) — c (dup of b only):
    // greedy accepts c; offline CC would drop it. The spec PINS the
    // documented online semantics.
    // b = 12 tokens; a edits b's LAST token (differs in 1 of 10
    // shingles, J = 9/11 ≈ 0.82), c edits b's FIRST (J(b,c) = 9/11),
    // so J(a,c) = 8/12 ≈ 0.67 < 0.8 — a genuine chain at t = 0.8
    val mid = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11"
    val a = (1L, s"$mid zzz")
    val b = (2L, s"$mid t12")
    val c = (3L, s"yyy ${mid.stripPrefix("t1 ")} t12")
    val all = Seq(a, b, c).toDF("doc_id", "text")
    // sanity: pair graph is the chain a-b, b-c
    val pairs = Dedup.nearDupPairs(all, "doc_id", "text", 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (2L, 3L)))
    val (src, sink, cp) = freshDirs()
    Seq(a).toDF("doc_id", "text").write.parquet(s"$src/d")
    val q1 = DocStream.nearDupIngestStream(spark, s"$src/d", all,
      "doc_id", "text", 0.8, sink, "docstream_chain", Some(cp))
    assert(q1.awaitTermination(180000))
    Seq(b, c).toDF("doc_id", "text").write.mode("append").parquet(s"$src/d")
    val q2 = DocStream.nearDupIngestStream(spark, s"$src/d", all,
      "doc_id", "text", 0.8, sink, "docstream_chain", Some(cp))
    assert(q2.awaitTermination(180000))
    val got = DocStream.accepted(spark, sink, all)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L)) // b rejected vs a; c survives (greedy)
    // offline CC on the same corpus drops BOTH b and c
    val offline = Dedup.dropNearDups(all, "doc_id",
      Dedup.nearDupPairs(all, "doc_id", "text", 0.8))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(offline === Set(1L))
  }

  test("cross-corpus rejection reads stored signatures, never accepted text") {
    // commit batch 1, then OVERWRITE the accepted partition's text
    // with garbage (same ids, same schema). Batch 2 carries a
    // near-identical copy of the ORIGINAL batch-1 text: if the
    // cross-corpus join read the accepted TEXT it would see garbage
    // and accept the copy; reading the stored _sig/ signatures
    // (computed at commit time) rejects it.
    val orig = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b1 = Seq((1L, orig),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val b2 = Seq((11L, orig),
      (12L, "completely different words appear in this document here now"))
      .toDF("doc_id", "text")
    val (src, sink, cp) = freshDirs()
    b1.write.mode("overwrite").parquet(s"$src/f")
    run(s"$src/f", sink, cp, "docstream_sig", b1)
    assert(new java.io.File(s"$sink/_sig/batch_id=0").isDirectory)
    Seq((1L, "g1 g2 g3 g4 g5 g6 g7 g8 g9 g10"),
      (2L, "h1 h2 h3 h4 h5 h6 h7 h8 h9 h10")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$sink/batch_id=0")
    b2.write.mode("append").parquet(s"$src/f")
    run(s"$src/f", sink, cp, "docstream_sig", b1)
    val got = DocStream.accepted(spark, sink, b1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 12L)) // 11 rejected via signatures alone
  }

  test("replay after crash-before-marker does not self-reject the batch") {
    // simulate the at-least-once window: batch N's partition (and
    // optionally its signatures) are on disk but the marker is not.
    // The replay must exclude its own partition from the accepted
    // corpus — otherwise every row self-matches and the replay lands
    // an EMPTY partition (silent data loss).
    val b1 = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val b2 = Seq((11L, "completely different words appear in this document here now"),
      (12L, "yet another block of fresh unrelated tokens for the spec"))
      .toDF("doc_id", "text")
    val (src, sink, cp) = freshDirs()
    b1.write.mode("overwrite").parquet(s"$src/f")
    run(s"$src/f", sink, cp, "docstream_replay", b1)
    b2.write.mode("append").parquet(s"$src/f")
    run(s"$src/f", sink, cp, "docstream_replay", b1)
    val before = DocStream.accepted(spark, sink, b1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(before === Set(1L, 2L, 11L, 12L))
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // window (b): marker missing, partition + signatures present
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$sink/_applied/docstream_replay/1"), false)
    DocStream.processBatch(spark, b2, 1L, "doc_id", "text", 0.9,
      sink, "docstream_replay")
    val afterB = DocStream.accepted(spark, sink, b1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterB === before)
    // window (a): marker AND signatures missing, partition present
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$sink/_applied/docstream_replay/1"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$sink/_sig/batch_id=1"), true)
    DocStream.processBatch(spark, b2, 1L, "doc_id", "text", 0.9,
      sink, "docstream_replay")
    val afterA = DocStream.accepted(spark, sink, b1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterA === before)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$sink/_sig/batch_id=1")))
  }

  test("legacy sink without _sig partitions still cross-rejects (fallback)") {
    val b1 = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val b2 = Seq((11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (12L, "completely different words appear in this document here now"))
      .toDF("doc_id", "text")
    val (src, sink, cp) = freshDirs()
    b1.write.mode("overwrite").parquet(s"$src/f")
    run(s"$src/f", sink, cp, "docstream_legacy", b1)
    // strip the signatures: the sink now looks like the pre-signature
    // layout — rejection must fall back to re-shingling that partition
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$sink/_sig"), true)
    b2.write.mode("append").parquet(s"$src/f")
    run(s"$src/f", sink, cp, "docstream_legacy", b1)
    val got = DocStream.accepted(spark, sink, b1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 12L))
  }

  test("compaction folds committed batches; later batches reject via gen signatures") {
    val o1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val o2 = "one two three four five six seven eight nine ten"
    val bA = Seq((1L, o1), (2L, o2)).toDF("doc_id", "text")
    val bB = Seq((11L, o1), // near-dup of accepted 1 → rejected
      (12L, "completely different words appear in this document here now"))
      .toDF("doc_id", "text")
    val bC = Seq((21L, o2), // near-dup of FOLDED 2 → must still reject
      (22L, "fresh unrelated tokens arriving after the first compaction"))
      .toDF("doc_id", "text")
    val bD = Seq((31L, "fresh unrelated tokens arriving after the first compaction"),
      (32L, "final wave of new material landing in the compacted sink"))
      .toDF("doc_id", "text")
    val sink = Files.createTempDirectory("docstream_compact").toString
    val name = "docstream_compact"
    def acceptedIds() = DocStream.accepted(spark, sink, bA)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dirNames() = fs.listStatus(new org.apache.hadoop.fs.Path(sink))
      .filter(_.isDirectory).map(_.getPath.getName).toSet

    DocStream.processBatch(spark, bA, 0L, "doc_id", "text", 0.9, sink,
      name, compactEvery = 2)
    assert(dirNames().contains("batch_id=0")) // 1 < compactEvery: no fold
    DocStream.processBatch(spark, bB, 1L, "doc_id", "text", 0.9, sink,
      name, compactEvery = 2)
    // fold happened: one generation, no live batch partitions
    assert(dirNames().exists(_.startsWith("gen=")))
    assert(!dirNames().exists(_.startsWith("batch_id=")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$sink/_sig/gen=0")))
    assert(acceptedIds() === Set(1L, 2L, 12L))

    // a batch arriving AFTER the fold must still reject near-dups of
    // folded docs — proof the gen's signature partition is being read
    DocStream.processBatch(spark, bC, 2L, "doc_id", "text", 0.9, sink,
      name, compactEvery = 2)
    assert(acceptedIds() === Set(1L, 2L, 12L, 22L))

    // crash-replay exclusion survives compaction: marker gone,
    // partition present → replay recomputes, output unchanged
    fs.delete(new org.apache.hadoop.fs.Path(s"$sink/_applied/$name/2"), false)
    DocStream.processBatch(spark, bC, 2L, "doc_id", "text", 0.9, sink,
      name, compactEvery = 2)
    assert(acceptedIds() === Set(1L, 2L, 12L, 22L))

    // second fold: generations accrete (gen=1 beside gen=0), earlier
    // generations untouched; 31 near-dups 22 (same text) → rejected
    DocStream.processBatch(spark, bD, 3L, "doc_id", "text", 0.9, sink,
      name, compactEvery = 2)
    assert(dirNames().count(_.startsWith("gen=")) === 2)
    assert(acceptedIds() === Set(1L, 2L, 12L, 22L, 32L))

    // crash window between publish and source deletion: a folded
    // source resurrected on disk is superseded by the manifest (no
    // double count) and the next compaction GC removes it. Real crash
    // debris PREDATES its generation (the fold read it before
    // publishing) — backdate the simulation to match, since the GC's
    // mtime guard deliberately refuses post-generation rewrites.
    Seq((1L, o1)).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$sink/batch_id=0")
    assert(new java.io.File(s"$sink/batch_id=0").setLastModified(
      new java.io.File(s"$sink/gen=0").lastModified() - 60000))
    assert(acceptedIds() === Set(1L, 2L, 12L, 22L, 32L)) // not doubled
    assert(DocStream.accepted(spark, sink, bA)
      .filter($"doc_id" === 1L).count() === 1L)
    DocStream.compactSink(spark, sink, bA, "doc_id", "text", name,
      minBatches = 99) // under threshold: GC only
    assert(!dirNames().contains("batch_id=0"))
  }

  test("tiered folding bounds live generations; rejection, replay and GC hold") {
    val sink = Files.createTempDirectory("docstream_tiered").toString
    val name = "docstream_tiered"
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dirNames() = fs.listStatus(new org.apache.hadoop.fs.Path(sink))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    // fully disjoint token sets per doc — no accidental near-dups;
    // token count grows with the wave so generation SIZES are strictly
    // ordered and the smallest-half pick is deterministic
    def txt(w: Int, i: Int) =
      (0 until 6 + 2 * w).map(j => s"w${w}d${i}t$j").mkString(" ")
    def wave(w: Int) =
      Seq((w * 10 + 1L, txt(w, 1)), (w * 10 + 2L, txt(w, 2)))
        .toDF("doc_id", "text")
    val schemaFrom = wave(0)
    def acceptedIds() = DocStream.accepted(spark, sink, schemaFrom)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // four waves, fold after each with maxGenerations = 2: fold 0 →
    // gen=0; fold 1 → gen=1 (2 live); fold 2 would make 3 live →
    // absorbs the SMALLEST (gen=0) into gen=2; fold 3 likewise
    // absorbs gen=1 (smaller than gen=2) into gen=3
    (0 until 4).foreach { w =>
      DocStream.processBatch(spark, wave(w), w.toLong, "doc_id", "text",
        0.9, sink, name)
      DocStream.compactSink(spark, sink, schemaFrom, "doc_id", "text",
        name, minBatches = 1, maxGenerations = 2)
    }
    assert(dirNames().filter(_.startsWith("gen=")) === Set("gen=2", "gen=3"))
    assert(!dirNames().exists(_.startsWith("batch_id=")))
    def manifest(g: String) = Manifests.readManifest(fs,
      new org.apache.hadoop.fs.Path(s"$sink/$g"))
    assert(manifest("gen=2") === Set("gen=0", "batch_id=2"))
    assert(manifest("gen=3") === Set("gen=1", "batch_id=3"))
    // sig twins follow: exactly the live generations' stores remain
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$sink/_sig"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
      === Set("gen=2", "gen=3"))
    assert(acceptedIds() === Set(1L, 2L, 11L, 12L, 21L, 22L, 31L, 32L))

    // a near-dup of a WAVE-0 doc (folded through two levels) must
    // still reject via the tiered generation's signatures
    val probe = Seq((91L, txt(0, 1)), (92L, txt(9, 9)))
      .toDF("doc_id", "text")
    DocStream.processBatch(spark, probe, 4L, "doc_id", "text", 0.9,
      sink, name)
    assert(acceptedIds() === Set(1L, 2L, 11L, 12L, 21L, 22L, 31L, 32L, 92L))
    // replay contract unchanged by tiered gens
    fs.delete(new org.apache.hadoop.fs.Path(s"$sink/_applied/$name/4"), false)
    DocStream.processBatch(spark, probe, 4L, "doc_id", "text", 0.9,
      sink, name)
    assert(acceptedIds() === Set(1L, 2L, 11L, 12L, 21L, 22L, 31L, 32L, 92L))

    // crash window: a superseded GENERATION resurrected on disk is
    // hidden by gen=2's manifest (no double count) and reaped by the
    // next call's GC — backdated, because real crash debris always
    // predates the generation that folded it
    Seq((1L, txt(0, 1))).toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$sink/gen=0")
    assert(new java.io.File(s"$sink/gen=0").setLastModified(
      new java.io.File(s"$sink/gen=2").lastModified() - 60000))
    assert(acceptedIds()
      === Set(1L, 2L, 11L, 12L, 21L, 22L, 31L, 32L, 92L))
    DocStream.compactSink(spark, sink, schemaFrom, "doc_id", "text",
      name, minBatches = 99) // under threshold: GC only
    assert(!dirNames().contains("gen=0"))
  }

  test("post-fold gen=K signatures still take the band-bucket prune: " +
      "plan-asserted, value-identical") {
    // the scale path's core claim: when the stored signatures live in
    // a compacted generation (a fold REWRITES the partition layout),
    // the cross-corpus join must still prune the stored side to the
    // batch's band buckets — the semi join is logical, not layout-
    // bound, but only a plan assert over the folded parquet proves it
    val o1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val o2 = "one two three four five six seven eight nine ten"
    val sink = Files.createTempDirectory("docstream_prune").toString
    val name = "docstream_prune"
    val bA = Seq((1L, o1), (2L, o2)).toDF("doc_id", "text")
    DocStream.processBatch(spark, bA, 0L, "doc_id", "text", 0.9, sink,
      name, compactEvery = 2)
    DocStream.processBatch(spark,
      Seq((11L, "totally different content for the second batch here"))
        .toDF("doc_id", "text"),
      1L, "doc_id", "text", 0.9, sink, name, compactEvery = 2)
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$sink/_sig/gen=0")))
    val genSigs = spark.read.parquet(s"$sink/_sig/gen=0")
    val batch = Seq((100L, o1), // near-dup of folded doc 1
      (101L, "nothing resembling any accepted document at all"))
      .toDF("doc_id", "text")
    def pairs(smallBytes: Long) =
      graft.dedup.Dedup.crossNearDupPairsVsSignatures(
        batch, "doc_id", "text", genSigs, threshold = 0.9,
        smallRelationBytes = smallBytes)
    val pruned = pairs(smallBytes = -1L) // force every scale-path prune
    val direct = pairs(smallBytes = Long.MaxValue)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(canon(pruned) === canon(direct))
    assert(canon(pruned) === Set((100L, 1L)),
      "the folded signature must still match its near-dup")
    // the stored side is semi-joined on the batch's (band, bucket)
    // set BEFORE any shingle work — the prune that keeps per-batch
    // cost independent of accepted-corpus size
    val plan = pruned.queryExecution.optimizedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("LeftSemi") &&
      l.contains("band") && l.contains("bucket")),
      s"no band-bucket LeftSemi prune in:\n$plan")
  }

  test("forced band index: rejects via the indexed face, rebuilds on " +
      "fold, and matches the scan path end-to-end") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "one two three four five six seven eight nine ten"
    val t3 = "red orange yellow green blue indigo violet colors rainbow sky"
    val t4 = "north south east west compass direction map travel journey path"
    val batches = Seq(
      Seq((1L, t1), (2L, t2)),
      Seq((11L, t3)),
      // 21 near-dups the FOLDED doc 1 — rejected via the index
      Seq((21L, t1), (22L, t4)),
      // post-fold dups of docs now in gen=0 (11, 2)
      Seq((31L, t3), (32L, t2)),
      // 41 dups 22, which folded into gen=1 — only a REBUILT index
      // (the generation set changed) can reject it
      Seq((41L, t4)))
    def runAll(sink: String, name: String, bytes: Long): Set[Long] = {
      batches.zipWithIndex.foreach { case (rows, i) =>
        DocStream.processBatch(spark, rows.toDF("doc_id", "text"),
          i.toLong, "doc_id", "text", 0.9, sink, name, compactEvery = 2,
          bandIndexBytes = bytes)
      }
      DocStream.accepted(spark, sink, batches.head.toDF("doc_id", "text"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val sinkA = Files.createTempDirectory("ds_bidx_on").toString
    val sinkB = Files.createTempDirectory("ds_bidx_off").toString
    try {
      val gotIdx = runAll(sinkA, "ds_bidx_on", 0L)
      val gotScan = runAll(sinkB, "ds_bidx_off", Long.MaxValue)
      assert(gotIdx === gotScan)
      assert(gotIdx === Set(1L, 2L, 11L, 22L))
      // the index tracked the fold lifecycle: rebuilt over BOTH live
      // generations after the second fold (gen=1 landed with batch 3,
      // so batch 4's reject of 41 proves the rebuild, not the cache)
      assert(DocStream.cachedIndexKey(sinkA) === Some("gen=0,gen=1"))
      // the byte gate kept the scan-path sink index-free
      assert(DocStream.cachedIndexKey(sinkB).isEmpty)
      // INCREMENTAL refresh: push one more fold (gen=2) and probe once
      // more — the surviving generations' sub-indexes must be the SAME
      // INSTANCES (reused, not rebuilt), only gen=2's is new
      val before = DocStream.cachedGenIndexes(sinkA)
      assert(before.keySet === Set("gen=0", "gen=1"))
      val extra = Seq(
        (51L, "quiet rivers flow beneath ancient stone bridges tonight"),
        (61L, "seven silver ships sail slowly toward southern shores"))
      extra.zipWithIndex.foreach { case ((id, txt), i) =>
        DocStream.processBatch(spark, Seq((id, txt)).toDF("doc_id", "text"),
          (5 + i).toLong, "doc_id", "text", 0.9, sinkA, "ds_bidx_on",
          compactEvery = 2, bandIndexBytes = 0L)
      }
      val after = DocStream.cachedGenIndexes(sinkA)
      assert(after.keySet === Set("gen=0", "gen=1", "gen=2"))
      assert(after("gen=0") eq before("gen=0"))
      assert(after("gen=1") eq before("gen=1"))
    } finally {
      DocStream.invalidateIndex(sinkA)
      DocStream.invalidateIndex(sinkB)
    }
  }

  test("concurrent index consults on one sink build once and leak no " +
      "persisted RDDs") {
    // the check-then-act window: two streams (or a replayed batch
    // racing a live one) on the same sinkDir could both miss the
    // cache, both build sub-indexes, and the losing put would leak
    // its persisted RDD until JVM exit. The per-sink build lock must
    // serialize them: afterwards exactly the CACHED sub-indexes'
    // RDDs may remain persisted — nothing orphaned.
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "one two three four five six seven eight nine ten"
    val sink = Files.createTempDirectory("ds_race").toString
    val schemaFrom = Seq((1L, t1)).toDF("doc_id", "text")
    try {
      DocStream.processBatch(spark, Seq((1L, t1)).toDF("doc_id", "text"),
        0L, "doc_id", "text", 0.9, sink, "ds_race", compactEvery = 2)
      DocStream.processBatch(spark, Seq((2L, t2)).toDF("doc_id", "text"),
        1L, "doc_id", "text", 0.9, sink, "ds_race", compactEvery = 2)
      assert(new java.io.File(s"$sink/_sig/gen=0").isDirectory)
      DocStream.invalidateIndex(sink) // everyone starts from a miss
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Set[Int]]
      val threads = (0 until 4).map { _ =>
        new Thread(() =>
          try {
            val idx = DocStream.consultIndex(spark, sink, schemaFrom,
              "doc_id", "text", minBytes = 0L)
            assert(idx.isDefined, "expected an index above the min gate")
            // probing it must work mid-race too
            assert(idx.get.indexedRows > 0)
          } catch { case e: Throwable => errs.add(e) })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(errs.isEmpty, s"concurrent consult failed: ${errs.peek()}")
      val cached = DocStream.cachedGenIndexes(sink)
      assert(cached.keySet === Set("gen=0"))
      val cachedIds = cached.values.map(_.rddId).toSet
      val leaked = spark.sparkContext.getPersistentRDDs.keySet
        .diff(before).diff(cachedIds)
      assert(leaked.isEmpty,
        s"orphaned persisted RDDs from racing builds: $leaked")
    } finally DocStream.invalidateIndex(sink)
  }

  test("over the memory ceiling the sink takes the fetched path — " +
      "no index cached, same accepted set") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "one two three four five six seven eight nine ten"
    val t3 = "red orange yellow green blue indigo violet colors rainbow sky"
    val batches = Seq(
      Seq((1L, t1), (2L, t2)),
      Seq((11L, t3)),
      // 21 near-dups the FOLDED doc 1 — must be rejected even with
      // the index gated off (the fetched scan path answers instead)
      Seq((21L, t1), (22L, "north south east west compass direction")))
    def runAll(sink: String, name: String, maxBytes: Long): Set[Long] = {
      batches.zipWithIndex.foreach { case (rows, i) =>
        DocStream.processBatch(spark, rows.toDF("doc_id", "text"),
          i.toLong, "doc_id", "text", 0.9, sink, name, compactEvery = 2,
          bandIndexBytes = 0L, bandIndexMaxBytes = maxBytes)
      }
      DocStream.accepted(spark, sink, batches.head.toDF("doc_id", "text"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val sinkA = Files.createTempDirectory("ds_ceiling_on").toString
    val sinkB = Files.createTempDirectory("ds_ceiling_off").toString
    try {
      val gotIdx = runAll(sinkA, "ds_ceiling_on", 0L) // auto: fits
      val gotGated = runAll(sinkB, "ds_ceiling_off", 1L) // over ceiling
      assert(gotIdx === gotGated)
      assert(gotIdx === Set(1L, 2L, 11L, 22L))
      assert(DocStream.cachedIndexKey(sinkA).isDefined,
        "the fitting sink should have built the index")
      assert(DocStream.cachedIndexKey(sinkB).isEmpty,
        "the over-ceiling sink must not hold an index")
      // and the gated verdict is cached per snapshot, not re-decided:
      // a direct consult at the same ceiling still answers None
      assert(DocStream.consultIndex(spark, sinkB, batches.head
        .toDF("doc_id", "text"), "doc_id", "text", minBytes = 0L,
        maxBytes = 1L).isEmpty)
    } finally {
      DocStream.invalidateIndex(sinkA)
      DocStream.invalidateIndex(sinkB)
    }
  }

  test("stream with compactEvery folds mid-stream and keeps rejecting") {
    val b1 = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val b2 = Seq((11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (12L, "completely different words appear in this document here now"))
      .toDF("doc_id", "text")
    val (src, sink, cp) = freshDirs()
    def runC(schemaFrom: org.apache.spark.sql.DataFrame): Unit = {
      val q = DocStream.nearDupIngestStream(spark, s"$src/f", schemaFrom,
        "doc_id", "text", 0.9, sink, "docstream_sc", Some(cp),
        compactEvery = 1)
      assert(q.awaitTermination(180000))
    }
    b1.write.mode("overwrite").parquet(s"$src/f")
    runC(b1)
    b2.write.mode("append").parquet(s"$src/f")
    runC(b1)
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(sink))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(names.exists(_.startsWith("gen=")))
    assert(!names.exists(_.startsWith("batch_id=")))
    val got = DocStream.accepted(spark, sink, b1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 12L))
  }

  test("restart with the same checkpoint reprocesses nothing") {
    val docs = TestSpark.table("documents").select("doc_id", "text").limit(100)
    val (src, sink, cp) = freshDirs()
    docs.write.mode("overwrite").parquet(src)
    run(src, sink, cp, "docstream_restart", docs)
    val first = DocStream.accepted(spark, sink, docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // restart: same checkpoint, same name — no new files, no new batches
    run(src, sink, cp, "docstream_restart", docs)
    val second = DocStream.accepted(spark, sink, docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(first === second)
  }

  test("online decontamination runs FIRST: a contaminated doc is dropped " +
    "and never acts as a dup keeper; its clean near-dup survives") {
    // doc1 carries a benchmark 4-gram → contaminated. doc2 is doc1
    // with the gram broken by one token edit (J(1,2) = 25/31 ≈ 0.81 ≥
    // 0.8): if dedup ran first, doc1 (lower id) would keep and doc2
    // would be dropped — decontamination-first means doc1 vanishes and
    // doc2 is judged alone. The bench doc itself arrives too and
    // rejects itself. doc3 (batch 2) is a near-dup of the ACCEPTED
    // doc2 (J = 27/29) → rejected by the clean path's signature join.
    val mid = (1 to 26).map(i => s"w$i").mkString(" ")
    val doc1 = (1L, s"$mid b1 b2 b3 b4")
    val doc2 = (2L, s"$mid b1 qq b3 b4")
    val doc3 = (3L, s"vv ${mid.stripPrefix("w1 ")} b1 qq b3 b4")
    val benchDoc = (99L, "b1 b2 b3 b4 b5 b6")
    val bench = Seq(benchDoc).toDF("doc_id", "text")
    val b1 = Seq(doc1, doc2, benchDoc).toDF("doc_id", "text")
    val b2 = Seq(doc3).toDF("doc_id", "text")
    val (src, sink, cp) = freshDirs()
    def runB(schemaFrom: org.apache.spark.sql.DataFrame): Unit = {
      val q = DocStream.nearDupIngestStream(spark, s"$src/f1", schemaFrom,
        "doc_id", "text", threshold = 0.8, sink, "docstream_decontam",
        Some(cp), bench = Some(bench), benchGramN = 4)
      assert(q.awaitTermination(180000), "decontam stream timed out")
    }
    b1.write.mode("overwrite").parquet(s"$src/f1")
    runB(b1)
    val afterB1 = DocStream.accepted(spark, sink, b1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterB1 === Set(2L),
      "doc1+bench contaminated out, doc2 judged alone and kept")
    b2.write.mode("append").parquet(s"$src/f1")
    runB(b1)
    val afterB2 = DocStream.accepted(spark, sink, b1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterB2 === Set(2L), "doc3 near-dups the accepted doc2 → rejected")
  }
}
