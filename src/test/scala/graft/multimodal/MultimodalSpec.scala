package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** documents' text bytes as fake image payloads (8×4 "pixels"). */
  private lazy val media = TestSpark.table("documents")
    .limit(100)
    .select($"doc_id", $"text")
    .as[(Long, String)]
    .map { case (id, text) =>
      (id, Multimodal.fakeMedia("img", 8, 4, text.getBytes("UTF-8")))
    }
    .toDF("doc_id", "media")

  test("withMeta decodes header into a typed struct") {
    val out = Multimodal.withMeta(media, "media")
    assert(out.schema("meta").dataType === Multimodal.metaSchema)
    val r = out.select("meta.format", "meta.width", "meta.height", "meta.n_bytes")
      .head
    assert(r.getString(0) === "img")
    assert(r.getInt(1) === 8 && r.getInt(2) === 4)
    assert(r.getLong(3) > 0)
  }

  test("null / too-short payloads yield null meta, not a crash") {
    val bad = Seq((1L, Array[Byte](1, 2, 3)), (2L, null))
      .toDF("doc_id", "media")
    val out = Multimodal.withMeta(bad, "media")
    assert(out.filter($"meta".isNull).count() === 2)
  }

  test("byteHistogram: L1-normalized fixed-width features") {
    val out = Multimodal.byteHistogram(media, "media", bins = 16)
    val feats = out.select("features").head.getSeq[Float](0)
    assert(feats.length === 16)
    assert(math.abs(feats.sum - 1.0f) < 1e-3)
    // deterministic across runs
    val again = Multimodal.byteHistogram(media, "media", bins = 16)
      .select("features").head.getSeq[Float](0)
    assert(feats === again)
  }

  test("mediaNearDups: identical payloads pair up; corrupt media excluded") {
    // two identical blobs, one noise blob, one undecodable null-ish blob
    val blobA = Multimodal.fakeMedia("img", 4, 4,
      Array.tabulate(256)(i => i.toByte))
    val blobB = Multimodal.fakeMedia("img", 4, 4,
      Array.tabulate(256)(i => (255 - i % 7 * 31).toByte))
    val df = Seq(
      (1L, blobA), (2L, blobA),     // exact dup pair
      (3L, blobB),                  // different histogram
      (4L, Array[Byte](1, 2)))      // too short → decode fails → excluded
      .toDF("id", "media")
    val pairs = Multimodal.mediaNearDups(df, "id", "media", threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("dHash64: gradient bits, nearest resample, payload-edge zeros") {
    // 9x8 "image" whose rows strictly decrease left-to-right: every
    // horizontal gradient is positive, all 64 bits set
    val desc = Array.tabulate(9 * 8)(i => (200 - (i % 9) * 10).toByte)
    assert(Multimodal.dHash64(desc, 9, 8) === -1L)
    // strictly increasing rows: no bit set
    val asc = Array.tabulate(9 * 8)(i => ((i % 9) * 10).toByte)
    assert(Multimodal.dHash64(asc, 9, 8) === 0L)
    // flat image: ties are NOT greater, no bit set
    assert(Multimodal.dHash64(Array.fill(72)(7.toByte), 9, 8) === 0L)
    // payload shorter than w*h: missing pixels read as 0 — a positive
    // run followed by the zero tail WITHIN row 0 sets the boundary
    // gradient bit (dHash compares horizontally, so the tail must cut
    // a row, not start a fresh one)
    val short = Array.fill(4)(50.toByte) // half of row 0 of an 8x4 grid
    val hShort = Multimodal.dHash64(short, 8, 4)
    assert(hShort !== 0L)
    // deterministic
    assert(Multimodal.dHash64(desc, 9, 8) === Multimodal.dHash64(desc, 9, 8))
  }

  test("mediaNearDupsPerceptual: planted near-identical media pair within radius") {
    // base "photo": a smooth horizontal gradient 16x8
    val base = Array.tabulate(16 * 8) { i => ((i % 16) * 12).toByte }
    // near-identical: one pixel nudged — resampled grid moves at most
    // a couple of gradient signs, so Hamming stays small
    val nudged = base.clone()
    nudged(5) = (nudged(5) + 3).toByte
    // structurally different: reversed gradient
    val other = Array.tabulate(16 * 8) { i => (180 - (i % 16) * 12).toByte }
    val df = Seq(
      (1L, Multimodal.fakeMedia("img", 16, 8, base)),
      (2L, Multimodal.fakeMedia("img", 16, 8, nudged)),
      (3L, Multimodal.fakeMedia("img", 16, 8, other)),
      (4L, Array[Byte](9))) // undecodable → excluded
      .toDF("id", "media")
    val pairs = Multimodal
      .mediaNearDupsPerceptual(df, "id", "media", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.forall(_._3 <= 3))
    // the reversed image is far from both in Hamming space
    val h = Multimodal.withDHash(df, "media")
      .filter($"dhash".isNotNull)
      .select($"id", $"dhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) > 3)
  }

  test("decode: real grayscale PNG round-trips bit-exact through ImageIO") {
    val px = Array.tabulate[Byte](72)(i => ((i * 37 + 11) % 256).toByte)
    val png = Multimodal.grayPng(px, 9, 8)
    // PNG magic — a real codec container, not the 12-byte fake header
    assert((png(0) & 0xff) === 0x89 &&
      new String(png.slice(1, 4), "US-ASCII") === "PNG")
    val (fmt, w, h, out) = Multimodal.decode(png).get
    assert(fmt === "png" && w === 9 && h === 8)
    assert(out.toSeq === px.toSeq)
  }

  test("decode: color PNG reduces by integer BT.601 luma") {
    val img = new java.awt.image.BufferedImage(3, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    img.setRGB(1, 0, 0x00ff00)
    img.setRGB(2, 0, 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (fmt, w, h, px) = Multimodal.decode(bos.toByteArray).get
    assert(fmt === "png" && w === 3 && h === 1)
    assert((px(0) & 0xff) === 255 * 299 / 1000)
    assert((px(1) & 0xff) === 255 * 587 / 1000)
    assert((px(2) & 0xff) === 255 * 114 / 1000)
  }

  test("decode: unrecognized payloads fall back to the fake-header stub") {
    val fake = Multimodal.fakeMedia("img", 8, 4, Array.tabulate(32)(_.toByte))
    val viaDecode = Multimodal.decode(fake).get
    val viaStub = Multimodal.decodeStub(fake).get
    assert(viaDecode._1 === viaStub._1 && viaDecode._2 === viaStub._2 &&
      viaDecode._3 === viaStub._3 &&
      viaDecode._4.toSeq === viaStub._4.toSeq)
    assert(Multimodal.decode(null) === None)
    assert(Multimodal.decode(Array[Byte](1, 2)) === None)
  }

  test("mediaNearDupsPerceptual over REAL PNGs: near pair within radius, distinct beyond") {
    val base = Array.tabulate[Byte](32 * 16)(i => ((i % 32) * 8).toByte)
    val nudged = base.clone()
    nudged(40) = (nudged(40) + 2).toByte // one-pixel edit
    val other = Array.tabulate[Byte](32 * 16)(i => (255 - (i % 32) * 8).toByte)
    val df = Seq(
      (1L, Multimodal.grayPng(base, 32, 16)),
      (2L, Multimodal.grayPng(nudged, 32, 16)),
      (3L, Multimodal.grayPng(other, 32, 16)))
      .toDF("id", "media")
    val pairs = Multimodal
      .mediaNearDupsPerceptual(df, "id", "media", maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
    // the reversed-gradient image is beyond the radius from both
    val h = Multimodal.withDHash(df, "media")
      .select($"id", $"dhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) > 7)
    assert(java.lang.Long.bitCount(h(1L) ^ h(2L)) <= 7)
  }

  test("decodeAudio: real PCM16 WAV round-trips samples bit-exact") {
    val samples = Array.tabulate[Short](64)(i => ((i - 32) * 997).toShort)
    val wav = Multimodal.pcm16Wav(samples, 16000)
    assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val (tpe, rate, ch, out) = Multimodal.decodeAudio(wav).get
    assert(tpe === "wave" && rate === 16000f && ch === 1)
    assert(out.toSeq === samples.toSeq)
    // non-audio payloads: None, not a crash
    assert(Multimodal.decodeAudio(null) === None)
    assert(Multimodal.decodeAudio(Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.decodeAudio(
      Multimodal.fakeMedia("img", 2, 2, new Array[Byte](4))) === None)
  }

  test("audioWindowEnergy: exact integer window sums, ragged tail, bad rows skipped") {
    val s1 = Array[Short](3, -4, 0, 2, 10) // windows of 2: 25, 4, 100
    val df = Seq(
      (1L, Multimodal.pcm16Wav(s1, 8000)),
      (2L, Array[Byte](1, 2))) // undecodable → no rows
      .toDF("id", "media")
    val got = Multimodal.audioWindowEnergy(df, "id", "media", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(got === Set((1L, 0, 2, 25L), (1L, 1, 2, 4L), (1L, 2, 1, 100L)))
  }

  test("resizeStub rewrites header and payload size") {
    val out = Multimodal.resizeStub(media, "media", 4, 2)
    val meta = Multimodal.withMeta(out, "media")
      .select("meta.width", "meta.height", "meta.n_bytes").head
    assert(meta.getInt(0) === 4 && meta.getInt(1) === 2)
    assert(meta.getLong(2) === 8) // 4*2 payload bytes
  }

  test("decode: malformed-but-recognized payloads return None, never throw") {
    val px = Array.tabulate[Byte](72)(i => (i * 3).toByte)
    val png = Multimodal.grayPng(px, 9, 8)
    // truncated mid-stream: recognized by signature, read blows up
    assert(Multimodal.decode(png.take(30)) === None)
    assert(Multimodal.decode(png.take(9)) === None)
    // garbage body after a valid signature+IHDR prefix
    val garbage = png.take(40) ++ Array.fill[Byte](64)(0x5A)
    assert(Multimodal.decode(garbage) === None)
  }

  test("decode: header declaring huge dimensions is rejected before allocation") {
    // patch a real PNG's IHDR to claim 60000x60000 (3.6 GPix) and fix
    // the chunk CRC so the reader believes it — the dimension guard
    // must return None BEFORE new Array[Byte](w*h) (which would be a
    // multi-GB allocation / negative-size overflow without it)
    val png = Multimodal.grayPng(Array.fill[Byte](72)(9), 9, 8)
    val patched = png.clone()
    def putInt(off: Int, v: Int): Unit = {
      patched(off) = (v >>> 24).toByte; patched(off + 1) = (v >>> 16).toByte
      patched(off + 2) = (v >>> 8).toByte; patched(off + 3) = v.toByte
    }
    putInt(16, 60000) // IHDR width  (sig 8 + len 4 + "IHDR" 4)
    putInt(20, 60000) // IHDR height
    val crc = new java.util.zip.CRC32()
    crc.update(patched, 12, 4 + 13) // "IHDR" + 13 data bytes
    putInt(12 + 4 + 13, crc.getValue.toInt)
    assert(Multimodal.decode(patched) === None)
  }

  test("decode: 16-bit grayscale PNG scales to its top 8 bits, not mod-256 garbage") {
    val img = new java.awt.image.BufferedImage(4, 1,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val samples = Array(0, 257, 0x7FFF, 0xFFFF) // 16-bit values
    img.getRaster.setSamples(0, 0, 4, 1, 0, samples)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (fmt, w, h, px) = Multimodal.decode(bos.toByteArray).get
    assert(fmt === "png" && w === 4 && h === 1)
    // top byte of each 16-bit sample; a mod-256 wrap would give
    // (0, 1, 255, 255) instead of (0, 1, 127, 255)
    assert(px.map(_ & 0xff).toSeq === samples.map(_ >>> 8).toSeq)
    // and 8-bit single-band stays BIT-exact (regression guard for the
    // oracle-certified q186 path)
    val p8 = Array.tabulate[Byte](72)(i => ((i * 37 + 11) % 256).toByte)
    assert(Multimodal.decode(Multimodal.grayPng(p8, 9, 8)).get._4.toSeq
      === p8.toSeq)
  }

  test("splitFrames: concatenated PNGs and MJPEG split into decodable frames") {
    // PNG container: 3 distinct frames
    val pats = (0 until 3).map(f =>
      Array.tabulate[Byte](72)(i => ((i + 29 * f) % 256).toByte))
    val clipPng = pats.map(Multimodal.grayPng(_, 9, 8)).reduce(_ ++ _)
    val fr = Multimodal.splitFrames(clipPng)
    assert(fr.length === 3)
    fr.zip(pats).foreach { case (f, p) =>
      val (fmt, w, h, px) = Multimodal.decode(f).get
      assert(fmt === "png" && w === 9 && h === 8)
      assert(px.toSeq === p.toSeq)
    }
    // MJPEG container: 2 JPEG frames of different sizes
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val mjpeg = jpeg(6, 4) ++ jpeg(10, 2)
    val jf = Multimodal.splitFrames(mjpeg)
    assert(jf.length === 2)
    assert(Multimodal.decode(jf(0)).get._2 === 6)
    assert(Multimodal.decode(jf(1)).get._2 === 10)
    // non-container payloads (fake header, null, empty) → no frames
    assert(Multimodal.splitFrames(
      Multimodal.fakeMedia("img", 2, 2, new Array[Byte](4))).isEmpty)
    assert(Multimodal.splitFrames(null).isEmpty)
    assert(Multimodal.splitFrames(Array[Byte](1, 2)).isEmpty)
  }

  test("videoFrameDHash: strided real-frame hashes; corrupt frame → null row") {
    val pats = (0 until 4).map(f =>
      Array.tabulate[Byte](72)(i => ((i * 7 + 13 * f) % 256).toByte))
    val clip = pats.map(Multimodal.grayPng(_, 9, 8)).reduce(_ ++ _)
    // clip 2: frame 1 truncated (still starts with the PNG signature,
    // so it splits as a frame but fails to decode)
    val good = Multimodal.grayPng(pats(0), 9, 8)
    val clipBad = good ++ good.take(20) ++ good
    val df = Seq((1L, clip), (2L, clipBad)).toDF("id", "media")
    val out = Multimodal.videoFrameDHash(df, "id", "media", stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSet
    // stride 2 over 4 frames → frame_no 0 and 2 (full-sequence index)
    val want1 = Set(
      (1L, 0, Some(Multimodal.dHash64(pats(0), 9, 8))),
      (1L, 2, Some(Multimodal.dHash64(pats(2), 9, 8))))
    val want2 = Set(
      (2L, 0, Some(Multimodal.dHash64(pats(0), 9, 8))),
      (2L, 2, Some(Multimodal.dHash64(pats(0), 9, 8))))
    assert(out === want1 ++ want2)
    // stride 1 on the bad clip surfaces the corrupt frame as a NULL row
    val all2 = Multimodal.videoFrameDHash(
        Seq((2L, clipBad)).toDF("id", "media"), "id", "media")
      .collect().map(r => (r.getInt(1), r.isNullAt(5))).toSet
    assert(all2 === Set((0, false), (1, true), (2, false)))
    // realFrames: same split, frames round-trip through decode
    val rf = Multimodal.realFrames(df.filter($"id" === 1L), "id", "media",
      stride = 3).collect()
    assert(rf.map(_.getInt(1)).toSeq === Seq(0, 3))
    assert(Multimodal.decode(rf(1).getAs[Array[Byte]]("frame")).get
      ._4.toSeq === pats(3).toSeq)
  }

  test("videoNearDups: re-encoded clips pair; one shared still does not") {
    def frame(seed: Int, nudge: Int = 0): Array[Byte] = {
      val px = Array.tabulate[Byte](72)(i => ((i * 11 + seed * 41) % 256).toByte)
      if (nudge != 0) px(5) = (px(5) + nudge).toByte
      Multimodal.grayPng(px, 9, 8)
    }
    val clipA = frame(1) ++ frame(2) ++ frame(3)
    val clipA2 = frame(1, nudge = 1) ++ frame(2) ++ frame(3, nudge = 1)
    // shares ONLY frame 0 with clipA — below minMatches
    val clipB = frame(1) ++ frame(7) ++ frame(8)
    val clipC = frame(20) ++ frame(21) ++ frame(22)
    val df = Seq((1L, clipA), (2L, clipA2), (3L, clipB), (4L, clipC))
      .toDF("id", "media")
    val got = Multimodal.videoNearDups(df, "id", "media",
      maxHamming = 3, minMatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.map(p => (p._1, p._2)) === Set((1L, 2L)))
    assert(got.head._3 === 3L) // all three frames matched
    // with minMatches = 1 the single shared still surfaces too
    val loose = Multimodal.videoNearDups(df, "id", "media",
      maxHamming = 3, minMatches = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(loose.map(p => (p._1, p._2)) === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(loose.find(p => p._1 == 1L && p._2 == 3L).get._3 === 1L)
  }

  test("audioFingerprint64 + audioNearDups: gradient bits, re-encode pairing") {
    // hand-checkable: windows of 2, energies 25, 4, 100, 0... →
    // bit0 (25>4)=1, bit1 (4>100)=0, bit2 (100>0)=1, rest 0
    val s1 = Array[Short](3, -4, 0, 2, 10, 0)
    val wav1 = Multimodal.pcm16Wav(s1, 8000)
    assert(Multimodal.audioFingerprint64(wav1, 2).get === 5L)
    assert(Multimodal.audioFingerprint64(Array[Byte](1, 2), 2) === None)
    // near-dup: base clip, a lightly perturbed re-encode, a reversed
    // clip (ranks inverted), an undecodable row
    val base = Array.tabulate[Short](130)(i => ((i % 17 - 8) * 800).toShort)
    val nudged = base.clone()
    nudged(3) = (nudged(3) + 900).toShort
    val other = base.reverse
    val df = Seq(
      (1L, Multimodal.pcm16Wav(base, 8000)),
      (2L, Multimodal.pcm16Wav(nudged, 8000)),
      (3L, Multimodal.pcm16Wav(other, 8000)),
      (4L, Array[Byte](7, 7)))
      .toDF("id", "media")
    val pairs = Multimodal.audioNearDups(df, "id", "media",
      windowSamples = 2, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 <= 3L)
    val fps = Multimodal.withAudioFingerprint(df, "media", 2)
      .filter($"afp".isNotNull).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(3L)) > 3)
  }

  test("sampleFrames explodes payload into strided frame rows") {
    val out = Multimodal.sampleFrames(media, "doc_id", "media",
      frameBytes = 16, stride = 2)
    assert(out.columns.toSeq === Seq("doc_id", "frame_no", "frame"))
    val frames = out.filter($"doc_id" === media.head.getLong(0))
    val frameNos = frames.select("frame_no").collect().map(_.getInt(0))
    assert(frameNos.forall(_ % 2 === 0))
    assert(frames.head.getAs[Array[Byte]]("frame").length === 16)
  }
}
