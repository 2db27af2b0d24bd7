package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Canary for the driver-generated fixture contract: if the driver
  * regenerates `/root/testdata` with different physical types (as it
  * did between rounds 4 and 5, moving events.ts from TIMESTAMP(NANOS)
  * stored as int64 to native TIMESTAMP(MICROS)), this ONE named test
  * fails instead of 17 scattered ones.
  *
  * The ORACLE side of the same discipline is `q180_oracle_canary`
  * (Queries.scala): DuckDB runs only driver-side, so oracle-engine
  * drift (the q157 class — a version bump changing sum typing,
  * rounding, collation, or interval clamping) is pinned by a query
  * whose probes fail the correctness gate one named row at a time.
  */
class FixtureCanarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every fixture table loads and resolves the expected key columns") {
    // events goes through its dual-generation loader: a legacy
    // TIMESTAMP(NANOS) fixture is a SUPPORTED generation there but
    // makes a raw parquet read throw at schema inference — only the
    // named events test below should flag a genuine contract shift
    val schemas = Tables.names.map { n =>
      n -> (if (n == "events") Tables.events(spark, TestSpark.sf).schema
            else TestSpark.table(n).schema)
    }.toMap
    // spine columns each family of queries depends on
    assert(schemas("lineitem")("l_quantity").dataType.isInstanceOf[NumericType])
    assert(schemas("lineitem")("l_returnflag").dataType == StringType)
    assert(Seq(DateType, StringType, TimestampNTZType)
      .contains(schemas("orders")("o_orderdate").dataType))
    assert(Seq(ByteType, ShortType, IntegerType, LongType)
      .contains(schemas("customer")("c_custkey").dataType))
    assert(schemas("documents")("text").dataType == StringType)
    assert(schemas("embeddings")("embedding").dataType ==
      ArrayType(FloatType, containsNull = true) ||
      schemas("embeddings")("embedding").dataType ==
      ArrayType(FloatType, containsNull = false) ||
      schemas("embeddings")("embedding").dataType ==
      ArrayType(DoubleType, containsNull = true) ||
      schemas("embeddings")("embedding").dataType ==
      ArrayType(DoubleType, containsNull = false))
  }

  test("events.ts normalizes to TIMESTAMP_NTZ through the one shared loader") {
    // the raw file may be int64-nanos (legacy) or TIMESTAMP(MICROS)
    // (native); both must resolve through Tables.events to NTZ, and
    // through eventsEpochMicros to BIGINT. All driver scale factors
    // checked: a PARTIAL fixture regeneration (one sf moved to a new
    // physical type) must fail here, not in the sf0.01 verify run
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(dir).isDirectory) {
        val evSf = Tables.events(spark, dir)
        assert(evSf.schema("ts").dataType == TimestampNTZType,
          s"$sf events.ts resolved as ${evSf.schema("ts").dataType}; " +
            "the fixture generation changed — update Tables.events")
        assert(Tables.eventsEpochMicros(spark, dir)
          .schema("ts").dataType == LongType, s"$sf epoch-micros loader")
      }
    }
    val ev = Tables.events(spark, TestSpark.sf)
    val em = Tables.eventsEpochMicros(spark, TestSpark.sf)
    // both views agree on the same instant for every row
    import org.apache.spark.sql.functions._
    val mismatch = ev
      .select(col("event_id"), expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
        .as("micros_a"))
      .join(em.select(col("event_id"), col("ts").as("micros_b")), "event_id")
      .filter(col("micros_a") =!= col("micros_b"))
      .count()
    assert(mismatch == 0L, s"$mismatch rows disagree between Tables.events and eventsEpochMicros")
  }

  test("signature-store canary: persisted (id, bands, sh) schema and band bits are frozen") {
    // The `_sig` relation DocStream persists per batch/generation is a
    // CROSS-RESTART contract: a stream stopped today rejects tomorrow's
    // batches against signatures written with TODAY's constants. A
    // silent change to the minhash seeds, band fold, shingle width
    // default, or the parquet encoding would corrupt that state
    // without any in-run test noticing — so this canary freezes (a)
    // the persisted schema, (b) one HARD-CODED band value and shingle
    // row, and (c) the parquet round-trip bit-identity. If a constant
    // change here is ever intentional, it needs a signature-store
    // migration story, not just a literal bump.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq((7L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val sig = graft.dedup.Dedup.nearDupSignatures(docs, "doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("sig_canary").toString
    try {
      sig.write.mode("overwrite").parquet(tmp)
      val back = spark.read.parquet(tmp)
      // Spark reads parquet back fully nullable — THAT is the
      // persisted face every later stream run resolves against
      assert(back.schema === StructType(Seq(
        StructField("id", LongType),
        StructField("bands", ArrayType(LongType, containsNull = true)),
        StructField("sh", ArrayType(StringType, containsNull = true)))),
        s"persisted signature schema drifted: ${back.schema.treeString}")
      val r = back.head()
      val bands = r.getSeq[Long](1)
      val sh = r.getSeq[String](2)
      assert(bands.length === 8, "default band count changed")
      assert(sh === Seq("alpha beta gamma", "beta gamma delta",
        "delta epsilon zeta", "gamma delta epsilon"),
        "default shingle width / sort order changed")
      // one frozen band value: minhash seeds + band fold + parquet
      // encoding, all pinned by a single literal
      assert(bands.head === 0x00A577D6344E6F03L,
        f"band0 drifted: 0x${bands.head}%016X")
      // round-trip bit-identity with the in-memory relation
      val mem = sig.head()
      assert(mem.getSeq[Long](1) === bands && mem.getSeq[String](2) === sh)
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("media canary: JDK PNG codec present and routed, fixture magic intact") {
    import graft.multimodal.Multimodal
    // decoder presence — q186 and the real-decode path die silently
    // (stub fallback hashing garbage) if a future runtime drops the
    // ImageIO PNG plugin, so pin it by name here
    assert(javax.imageio.ImageIO.getImageReadersByFormatName("png").hasNext,
      "no ImageIO PNG reader on this JVM — the real-decode contract broke")
    assert(javax.imageio.ImageIO.getImageWritersByFormatName("png").hasNext,
      "no ImageIO PNG writer on this JVM — grayPng cannot build fixtures")
    val png = Multimodal.grayPng(Array.tabulate[Byte](72)(_.toByte), 9, 8)
    assert((png(0) & 0xff) === 0x89 &&
      new String(png.slice(1, 4), "US-ASCII") === "PNG",
      "grayPng no longer emits PNG magic bytes")
    // routing: a PNG payload must decode through ImageIO (format
    // 'png', true dimensions), never the fake-header stub
    val (fmt, w, h, _) = Multimodal.decode(png).get
    assert(fmt === "png" && w === 9 && h === 8,
      s"PNG decoded as ($fmt, $w, $h) — fell back to the stub?")
    // the fake-header fixture format keeps decoding through the stub
    val fake = Multimodal.fakeMedia("img", 8, 4, new Array[Byte](32))
    assert(Multimodal.decode(fake).get._1 === "img")
    // audio half (q188): the JDK WAV parser must be present and
    // round-trip PCM16 — pinned the same way
    val wav = Multimodal.pcm16Wav(Array[Short](1, -2, 3), 8000)
    assert(Multimodal.decodeAudio(wav).get._4.toSeq === Seq[Short](1, -2, 3),
      "JDK javax.sound WAV parser missing or PCM16 round-trip broke")
  }

  test("README's advertised query count tracks SparkEntry.queries") {
    // the README is the capability contract, and its count line has
    // drifted twice (r10: said 200 while shipping 201; r11 review:
    // said 201 while shipping 202) — pin it to the source of truth
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val n = SparkEntry.queries.size
    val advertised = "(\\d+) hash-verified quer".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    val layout = "the (\\d+)-query surface".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    assert(advertised.nonEmpty && layout.nonEmpty,
      "README no longer carries the advertised-count lines")
    assert((advertised ++ layout).forall(_ == n),
      s"README advertises ${(advertised ++ layout).distinct.sorted} but " +
        s"the surface is $n queries — update README.md's count lines")
  }
}
