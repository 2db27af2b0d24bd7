package graft.text

import graft.TestSpark
import graft.operators.PrefixSum
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-3 curation additions: decontamination, repetition
  * metrics, PII redaction, distributed prefix-sum packing. */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontamination flags exactly the docs sharing an n-gram") {
    val bench = Seq((0L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "a quick brown fox jumps today"), // shares "quick brown fox jumps"
      (11L, "the quick brown dog sits"), //      longest shared run is 3 words
      (12L, "completely unrelated words here")
    ).toDF("doc_id", "text")
    val flagged = Decontaminate
      .contaminatedIds(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(10L))
    val clean = Decontaminate
      .decontaminate(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(clean === Set(11L, 12L))
  }

  test("decontamination catches short eval docs via the whole-text gram") {
    val bench = Seq((0L, "two words")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "two words"), //   exact short copy
      (11L, "two words more") // a 3-token doc: grams are whole-text only at n=4
    ).toDF("doc_id", "text")
    val flagged = Decontaminate
      .contaminatedIds(corpus, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(10L))
  }

  test("repetition metrics match hand-computed fractions") {
    // bigrams of "a b a b a": [a b, b a, a b, b a] -> 4 total, 2 distinct,
    // max count 2 -> dup_frac 0.5, top_frac 0.5
    val df = Seq((1L, "a b a b a"), (2L, "x y z")).toDF("doc_id", "text")
    val m = TextOps.repetitionMetrics(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(m(1L) === ((4L, 0.5, 0.5)))
    assert(m(2L) === ((2L, 0.0, 0.5))) // [x y, y z]: all distinct, max 1/2
  }

  test("redaction scrubs all three families and counts before replacing") {
    val df = Seq(
      (1L, "mail bob@example.com ip 10.0.0.1 acct 12345678"),
      (2L, "nothing to hide")
    ).toDF("id", "text")
    val out = Redact.scrub(df, "text")
      .select($"id", $"redacted", Redact.totalRedactions().as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("mail <EMAIL> ip <IP> acct <NUM>", 3L)))
    assert(out(2L) === (("nothing to hide", 0L)))
  }

  test("cumsum equals the driver-computed prefix sum across buckets") {
    // integral input: the prefix sum must come back as exact longs
    val df = (1L to 250L).map(i => (i, i % 7 + 1)).toDF("k", "v")
    val got = PrefixSum.cumsum(df, "k", "v", "cum", bucketWidth = 50L)
      .select($"k", $"cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    var acc = 0L
    (1L to 250L).foreach { i =>
      acc += i % 7 + 1
      assert(got(i) === acc, s"at k=$i")
    }
  }

  test("cumsum on a fractional column returns a double prefix sum") {
    val df = Seq((1L, 0.5), (2L, 0.25), (3L, 1.0)).toDF("k", "v")
    val got = PrefixSum.cumsum(df, "k", "v", "cum", bucketWidth = 2L)
      .select($"k", $"cum").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got === Map(1L -> 0.5, 2L -> 0.75, 3L -> 1.75))
  }

  test("cumsum plan has no single-partition global window") {
    // persist=false keeps the full lineage visible (the persisted path
    // returns a localCheckpoint whose plan is an opaque cached scan)
    val df = (1L to 100L).map(i => (i, 1L)).toDF("k", "v")
    val plan = PrefixSum.cumsum(df, "k", "v", "cum", bucketWidth = 10L,
      persist = false)
      .queryExecution.executedPlan.toString
    // every window must be partitioned (by the bucket): a global-order
    // window would show an empty partition spec
    assert(!plan.contains("windowspecdefinition(k#"), plan.take(500))
    assert(plan.contains("windowspecdefinition(__bucket"), plan.take(500))
  }

  test("dupClusters: components found across chains, cluster = min id") {
    // components: {1,2,3,7} (chain + branch), {10,11}, {20..29} (long
    // chain - forces several propagation rounds), singleton edge {40,41}
    val edges = (Seq((1L, 2L), (2L, 3L), (2L, 7L), (10L, 11L), (40L, 41L)) ++
      (20L until 29L).map(i => (i, i + 1))).toDF("id_a", "id_b")
    val got = graft.dedup.Dedup.dupClusters(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 1L && got(7L) === 1L)
    assert(got(10L) === 10L && got(11L) === 10L)
    (20L to 29L).foreach(i => assert(got(i) === 20L, s"node $i"))
    assert(got(40L) === 40L && got(41L) === 40L)
    assert(got.size === 18)
  }

  test("dropNearDups keeps exactly one doc per component") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "z")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = graft.dedup.Dedup.dropNearDups(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 9L)) // component min survives; untouched doc survives
  }

  test("bpePairCounts: weighted by word frequency, 1-char words excluded") {
    // "ab ab a cd" -> vocab: ab(x2), a(x1, dropped), cd(x1)
    val df = Seq((1L, "ab ab a"), (2L, "cd")).toDF("doc_id", "text")
    val got = TextOps.bpePairCounts(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("ab" -> 2L, "cd" -> 1L))
  }

  test("bpeApply: leftmost lowest-rank merges to fixpoint, hand-checked") {
    // merges: at=0, th=1, he=2
    val ranks = Map(("a", "t") -> 0, ("t", "h") -> 1, ("h", "e") -> 2)
    assert(TextOps.bpeApply("cat", ranks) === Seq("c", "at"))
    // "the": th (rank 1) beats he (rank 2); (th,e) is not a merge
    assert(TextOps.bpeApply("the", ranks) === Seq("th", "e"))
    // leftmost tie: both th occurrences rank 1, the first merges first,
    // and the loop still reaches the same fixpoint
    assert(TextOps.bpeApply("ththe", ranks) === Seq("th", "th", "e"))
    // no applicable merges / single char / empty
    assert(TextOps.bpeApply("xyz", ranks) === Seq("x", "y", "z"))
    assert(TextOps.bpeApply("q", ranks) === Seq("q"))
    assert(TextOps.bpeApply("", ranks) === Seq())
    // multi-symbol merges chain: (at,s) after (a,t)
    val r2 = Map(("a", "t") -> 0, ("at", "s") -> 1)
    assert(TextOps.bpeApply("ats", r2) === Seq("ats"))
    // supplementary character: codepoint split, not UTF-16 units
    assert(TextOps.bpeApply("a😀b", Map.empty) ===
      Seq("a", "😀", "b"))
  }

  test("bpeMerges + bpeTokenCounts: ranked one-shot table, weighted doc counts") {
    val df = Seq((1L, "the cat sat on the mat"), (2L, "the thin cat"),
      (3L, "thethe mat mat")).toDF("doc_id", "text")
    val merges = TextOps.bpeMerges(df, "text", 5)
    val m = merges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    // counts: at=6, th=6, he=5, ma=3, ca=2 → ties break pair-ASC
    assert(m.sortBy(_._3) === Seq(("a", "t", 0), ("t", "h", 1),
      ("h", "e", 2), ("m", "a", 3), ("c", "a", 4)))
    val counts = TextOps.bpeTokenCounts(df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: the(2)+cat(2)+sat(2)+on(2)+mat(2) weighted by occurrence:
    // the×2→4, cat→2, sat→2, on→2, mat→2 = 12 bpe; 6 ws words
    assert(counts(1L) === ((6L, 12L)))
    // doc 3: thethe→4 ("th e th e"), mat×2→4 = 8 bpe; 3 ws words
    assert(counts(3L) === ((3L, 8L)))
  }

  test("chunkTokens: overlapping windows cover the doc, short doc = one chunk") {
    val df = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextOps.chunkTokens(df, "doc_id", "text", size = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got === Set(
      (1L, 0, "t1 t2 t3 t4"), (1L, 1, "t4 t5 t6 t7"), (1L, 2, "t7 t8 t9 t10"),
      (2L, 0, "a b")))
  }

  test("forwardFill carries last observation per key, leading nulls stay null") {
    val df = Seq(
      (1L, 1L, Some(10.0)), (1L, 2L, None), (1L, 3L, Some(30.0)), (1L, 4L, None),
      (2L, 1L, None), (2L, 2L, Some(5.0))
    ).toDF("k", "o", "v")
    val got = graft.features.Features.forwardFill(df, "k", Seq("o"), "v", "f")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got((1L, 1L)) === Some(10.0))
    assert(got((1L, 2L)) === Some(10.0))
    assert(got((1L, 3L)) === Some(30.0))
    assert(got((1L, 4L)) === Some(30.0))
    assert(got((2L, 1L)) === None) // nothing observed yet
    assert(got((2L, 2L)) === Some(5.0))
  }

  test("profile: one pass, correct null and distinct counts") {
    val df = Seq((Some(1), Some("x")), (Some(1), None), (None, Some("y")))
      .toDF("a", "b")
    val got = graft.etl.Profile.profile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") === ((3L, 1L, 1L)))
    assert(got("b") === ((3L, 1L, 2L)))
  }

  test("scd2FromChangeLog: runs collapse, intervals abut, one open episode per key") {
    val log = Seq(
      (1L, "A", 1L), (1L, "A", 2L), (1L, "B", 3L), (1L, "B", 4L), (1L, "A", 5L),
      (2L, "X", 1L),
      (3L, "P", 2L), (3L, null.asInstanceOf[String], 3L), (3L, "P", 4L)
    ).toDF("k", "attr", "ts")
    val h = graft.etl.Scd.scd2FromChangeLog(log, Seq("k"), Seq("attr"), Seq("ts", "ts"))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)).getOrElse("<null>"), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .sortBy(t => (t._1, t._5))
    // key 1: A[1,3) v1, B[3,5) v2, A[5,∞) v3 — A reappearing is a NEW episode
    assert(h.filter(_._1 == 1L) === Seq(
      (1L, "A", 1L, 3L, 1L, false), (1L, "B", 3L, 5L, 2L, false),
      (1L, "A", 5L, -1L, 3L, true)))
    // key 2: single open episode
    assert(h.filter(_._1 == 2L) === Seq((2L, "X", 1L, -1L, 1L, true)))
    // key 3: null attr is a real state (null-safe change detection)
    assert(h.filter(_._1 == 3L) === Seq(
      (3L, "P", 2L, 3L, 1L, false), (3L, "<null>", 3L, 4L, 2L, false),
      (3L, "P", 4L, -1L, 3L, true)))
    // exactly one current row per key
    assert(h.count(_._6) === 3)
  }

  test("kFolds: deterministic, in-range, roughly uniform") {
    val df = spark.range(0, 5000).toDF("id")
    val folds = graft.features.Features.kFolds(df, "id", 5)
    val again = graft.features.Features.kFolds(df.repartition(7), "id", 5)
    val counts = folds.groupBy("fold").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set(0L, 1L, 2L, 3L, 4L))
    counts.values.foreach(n => assert(n > 800 && n < 1200, s"skewed fold: $n"))
    // identical assignment regardless of partitioning
    val a = folds.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = again.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("weightedSamplePerGroup: k rows per group, heavy weights dominate") {
    val df = (1L to 400L).map { i =>
      // ids 1..20 carry 100x the weight of the rest
      ("g" + (i % 2), i, if (i <= 20) 1000.0 else 10.0)
    }.toDF("g", "id", "w")
    val got = graft.features.Features
      .weightedSamplePerGroup(df, "g", "id", "w", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.groupBy(_._1).forall(_._2.length == 5))
    // with a 100:1 weight ratio most winners come from the heavy block
    assert(got.count(_._2 <= 20) >= 6, got.mkString(","))
    // deterministic replay
    val again = graft.features.Features
      .weightedSamplePerGroup(df.repartition(5), "g", "id", "w", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSet === again.toSet)
  }

  test("charEntropy: zero for uniform runs, one bit for a 50/50 mix") {
    val df = Seq((1L, "aaaaaaaa"), (2L, "abababab")).toDF("doc_id", "text")
    val got = TextOps.charEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) === ((8L, 0.0)))
    assert(got(2L) === ((8L, 1.0)))
  }

  test("quantileBins: equal-frequency buckets, monotone boundaries") {
    val df = (1L to 1000L).map(i => (i, i.toDouble)).toDF("id", "v")
    val bins = graft.features.Features.quantileBins(df, "v", 4)
      .groupBy("bin").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bins.keySet === Set(0L, 1L, 2L, 3L))
    bins.values.foreach(n => assert(n >= 240 && n <= 260, bins.toString))
  }

  test("tfidf: corpus-wide terms score below rare discriminative terms") {
    val df = Seq(
      (1L, "common rare1"),
      (2L, "common rare2"),
      (3L, "common common common")).toDF("doc_id", "text")
    val top = TextOps.tfidfTopTerms(df, "doc_id", "text", nDocs = 3L, k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // equal tf within docs 1/2: the everywhere-term loses on idf
    assert(top(1L) === "rare1")
    assert(top(2L) === "rare2")
    assert(top(3L) === "common") // only term present
  }

  test("invertedIndex: sorted postings, per-doc-distinct df, maxDf pruning") {
    val docs = Seq(
      (3L, "alpha beta beta gamma"),
      (1L, "alpha gamma"),
      (2L, "beta delta")).toDF("doc_id", "text")
    val idx = TextOps.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[Long](1), r.getLong(2)))).toMap
    assert(idx("alpha") === ((Seq(1L, 3L), 2L)))
    assert(idx("beta") === ((Seq(2L, 3L), 2L))) // doubled in doc 3 → once
    assert(idx("gamma") === ((Seq(1L, 3L), 2L)))
    assert(idx("delta") === ((Seq(2L), 1L)))
    val pruned = TextOps.invertedIndex(docs, "doc_id", "text", maxDf = Some(1L))
      .select("term").collect().map(_.getString(0)).toSet
    assert(pruned === Set("delta"))
  }

  test("searchAnd: conjunctive intersection; absent term empties the result") {
    val docs = Seq(
      (1L, "spark shuffle join"),
      (2L, "spark join broadcast"),
      (3L, "spark shuffle")).toDF("doc_id", "text")
    val idx = TextOps.invertedIndex(docs, "doc_id", "text")
    def search(ts: String*) = TextOps.searchAnd(idx, ts)
      .collect().map(_.getLong(0)).toSet
    assert(search("spark", "join") === Set(1L, 2L))
    assert(search("spark") === Set(1L, 2L, 3L))
    assert(search("spark", "join", "shuffle") === Set(1L))
    assert(search("spark", "nosuchterm") === Set.empty)
    // duplicate query terms must not double-count hits
    assert(search("spark", "spark", "join") === Set(1L, 2L))
  }

  test("packBudget: packs fill to the budget, overflow at most one doc") {
    val df = (0L until 100L).map(i => (i, 100L)).toDF("doc_id", "n_tokens")
    val packs = PrefixSum
      .packBudget(df, "doc_id", "n_tokens", budget = 250L, bucketWidth = 30L)
      .groupBy("pack_id").agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // 100 docs x 100 tokens into 250-budget packs: each pack takes the
    // doc that crosses its boundary -> 3 docs (300 tokens) per pack
    assert(packs.forall { case (_, tok, _) => tok <= 250L + 100L })
    assert(packs.map(_._3).sum === 100L)
    assert(packs.map(_._1).toSeq === packs.map(_._1).toSeq.sorted)
  }

  test("gopherRules: each rule trips on its planted violator") {
    val good = (("the quick brown fox jumps over " * 12) +
      "lazy dogs that have fun with energy and delight be told").trim
    val docs = Seq(
      (1L, good), // passes everything
      (2L, "too few words here"), // n_words < min
      (3L, good + " ### " + ("#word " * 9).trim), // symbol ratio > 0.1
      (4L, (1 to 10).map(i => s"- bullet item $i of the list that have").mkString("\n")), // bullets
      (5L, good.split(" ").map(w => w + "...").mkString("\n")), // ellipsis lines
      (6L, ("12345 67890 " * 30).trim + " the of and that") // numeric words
    ).toDF("doc_id", "text")
    val r = TextOps.gopherRules(docs, "doc_id", "text", minWords = 20)
      .collect().map(x => x.getLong(0) ->
        (x.getBoolean(8), x.getDouble(2), x.getDouble(3), x.getDouble(4),
          x.getDouble(5), x.getDouble(6), x.getLong(7))).toMap
    assert(r(1L)._1, s"good doc rejected: ${r(1L)}")
    assert(!r(2L)._1)
    assert(!r(3L)._1 && r(3L)._3 > 0.1, s"symbols: ${r(3L)}")
    assert(!r(4L)._1 && r(4L)._4 === 1.0, s"bullets: ${r(4L)}")
    assert(!r(5L)._1 && r(5L)._5 === 1.0, s"ellipsis: ${r(5L)}")
    assert(!r(6L)._1 && r(6L)._6 < 0.8, s"alpha: ${r(6L)}")
    // empty text: zero words, keep = false, no division blowup
    val e = TextOps.gopherRules(Seq((9L, "")).toDF("doc_id", "text"),
      "doc_id", "text").head()
    assert(e.getLong(1) === 0L && !e.getBoolean(8))
  }

  test("vocabCoverage: all-in-vocab doc scores 0, all-OOV doc scores 1") {
    // 10 docs of common words (the vocab), one doc of unique words
    val docs = ((0L until 10L).map(i => (i, "alpha beta gamma")) :+
      (99L, "zzq1 zzq2 zzq3")).toDF("doc_id", "text")
    val got = TextOps.vocabCoverage(docs, "doc_id", "text", vocabSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(got.filter(_._1 < 10L).forall { case (_, n, r) => n == 3L && r == 0.0 })
    assert(got.find(_._1 == 99L).exists { case (_, n, r) => n == 3L && r == 1.0 })
    // empty doc emits no row
    val e = TextOps.vocabCoverage(
      Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", 10)
    assert(e.count() === 1)
  }

  test("winnow: shared run guarantee, rightmost tie rule, short docs empty") {
    val shared = "one two three four five six seven" // 7 tokens = w+k-1
    val docs = Seq(
      (1L, s"prefix words here $shared and a tail"),
      (2L, s"$shared completely different ending tokens"),
      (3L, "too short"),
      (4L, "rep rep rep rep rep rep rep rep") // all shingles identical
    ).toDF("doc_id", "text")
    val fp = TextOps.winnow(docs, "doc_id", "text", k = 4, w = 4)
    val byDoc = fp.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
    // guarantee: docs 1 and 2 share >= w+k-1 consecutive tokens ->
    // at least one common fingerprint hash
    val f1 = byDoc(1L).map(_._3).toSet
    val f2 = byDoc(2L).map(_._3).toSet
    assert(f1.intersect(f2).nonEmpty, s"no shared fingerprint: $f1 vs $f2")
    // doc 3 has < k+w-1 tokens -> no complete window -> absent
    assert(!byDoc.contains(3L))
    // doc 4: every shingle hashes equal -> tie resolves to the
    // RIGHTMOST position of each window; selected positions are the
    // window ends 3..4 (8 tokens -> 5 shingles, windows end at 3,4)
    assert(byDoc(4L).map(_._2).sorted.toSeq === Seq(3L, 4L))
    // determinism across repartition
    val again = TextOps.winnow(docs.repartition(7), "doc_id", "text", 4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(again === fp.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet)
  }
}
