package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travel as opaque `binary` columns with typed
  * metadata structs; decode / feature-extract / resize / frame-sample
  * run as partition-local batch operators (`mapPartitions`), which is
  * the Scala analog of a vectorized pandas UDF — one iterator per
  * partition, library handles amortized per batch, no per-row JVM/
  * interpreter crossings.
  *
  * IMAGE decode is REAL: [[decode]] routes through the JDK's
  * `javax.imageio` (PNG/JPEG/BMP/GIF/WBMP readers ship with every
  * JDK — zero new dependencies), reducing to a row-major grayscale
  * pixel buffer (8-bit grayscale rasters pass through bit-exact;
  * color reduces by integer BT.601 luma). AUDIO decode is REAL
  * ([[decodeAudio]] via `javax.sound.sampled`, PCM16 bit-exact).
  * VIDEO has a real concatenated-frame face — [[splitFrames]] /
  * [[realFrames]] / [[videoFrameDHash]] read MJPEG (concatenated
  * JPEGs) and concatenated-PNG containers through the real image
  * codec per frame; general containers (MP4/H.264 etc.) have no JDK
  * codec and fall back to [[decodeStub]]'s deterministic fake-header
  * format, with the Spark-side schema/batching/partitioning real and
  * tested ([[sampleFrames]]).
  */
object Multimodal {

  // ImageIO's default stream cache spills to temp FILES per decode —
  // per-row disk I/O inside a scan; keep the cache in memory
  javax.imageio.ImageIO.setUseCache(false)

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Deterministic fake "encode": 12-byte header (4-char format tag,
    * int width, int height, big-endian) + payload. Lets tests build
    * valid media values from any byte string. */
  def fakeMedia(format: String, width: Int, height: Int,
      payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
    bb.put(format.padTo(4, ' ').take(4).getBytes("US-ASCII"))
    bb.putInt(width).putInt(height).put(payload)
    bb.array()
  }

  /** STUB decode: parse the fake header. The fallback half of
    * [[decode]] — covers the fixture format and stands in for the
    * audio/video codecs this container doesn't ship. */
  def decodeStub(media: Array[Byte]): Option[(String, Int, Int, Array[Byte])] =
    if (media == null || media.length < 12) None
    else {
      val bb = java.nio.ByteBuffer.wrap(media)
      val tag = new Array[Byte](4)
      bb.get(tag)
      val w = bb.getInt
      val h = bb.getInt
      val payload = new Array[Byte](media.length - 12)
      bb.get(payload)
      Some((new String(tag, "US-ASCII").trim, w, h, payload))
    }

  /** Decode refuses images whose header declares more pixels than
    * this (a corrupt or adversarial header can claim 2G×2G and the
    * naive `new Array[Byte](w*h)` would OOM the task before a single
    * real pixel exists — at corpus scale one such payload per billion
    * kills a stage). 256 MPix ≈ a 16k×16k scan, far above any
    * training-corpus image. */
  val MaxDecodePixels: Long = 256L * 1024 * 1024

  /** REAL media decode: `javax.imageio` for any payload an installed
    * reader recognizes (the JDK ships PNG/JPEG/BMP/GIF/WBMP),
    * returning (format, width, height, row-major grayscale pixels).
    * 8-bit single-band rasters (grayscale PNG etc.) read through the
    * raster BIT-EXACT — no colorspace math — which is what lets a SQL
    * oracle replay a hash of the decoded pixels (q186); deeper
    * single-band rasters (16-bit grayscale PNG) right-shift to their
    * top 8 bits (a plain `.toByte` would wrap mod 256 and hand
    * garbage gradients to every downstream hash); multi-band images
    * reduce by the integer BT.601 luma (299·R + 587·G + 114·B)/1000,
    * integer-only so the value is identical on every JVM. Unrecognized
    * payloads fall back to the fake-header [[decodeStub]] (tried
    * second: a real PNG would "parse" as a garbage fake header, so
    * ImageIO gets first claim). Returns None for null/corrupt media —
    * including malformed-but-recognized payloads whose plugin throws
    * an UNCHECKED exception (the JDK readers raise CMMException /
    * IndexOutOfBounds / NegativeArraySize on truncated or lying
    * streams; a corpus decode must degrade to a null row, never fail
    * the task) and headers declaring non-positive or
    * > [[MaxDecodePixels]] dimensions. */
  def decode(media: Array[Byte]): Option[(String, Int, Int, Array[Byte])] = {
    if (media == null) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(media))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return decodeStub(media)
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        // dimension sanity BEFORE the full-image read/allocation:
        // getWidth/getHeight parse only the header
        val wDecl = reader.getWidth(0).toLong
        val hDecl = reader.getHeight(0).toLong
        if (wDecl <= 0 || hDecl <= 0 || wDecl * hDecl > MaxDecodePixels)
          return None
        val img = reader.read(0)
        val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) return None
        val px = new Array[Byte](w * h)
        val raster = img.getRaster
        if (raster.getNumBands == 1) {
          val bits = raster.getSampleModel.getSampleSize(0)
          val shift = math.max(0, bits - 8)
          val samples = raster.getSamples(0, 0, w, h, 0,
            null.asInstanceOf[Array[Int]])
          var i = 0
          while (i < px.length) {
            px(i) = (samples(i) >>> shift).toByte; i += 1
          }
        } else {
          val rgb = img.getRGB(0, 0, w, h, null, 0, w)
          var i = 0
          while (i < px.length) {
            val p = rgb(i)
            px(i) = ((((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
              (p & 0xff) * 114) / 1000).toByte
            i += 1
          }
        }
        Some((fmt, w, h, px))
      } catch {
        case scala.util.control.NonFatal(_) => None
      } finally reader.dispose()
    } finally if (iis != null) iis.close()
  }

  /** Encode a row-major grayscale pixel buffer as a REAL PNG via the
    * JDK ImageIO writer — the test/fixture producer for [[decode]]'s
    * bit-exact single-band path (PNG grayscale round-trips the exact
    * bytes). */
  def grayPng(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length >= w * h, s"need $w*$h pixels, got ${pixels.length}")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h,
      java.util.Arrays.copyOf(pixels, w * h))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** PCM16 mono WAV encode (RIFF header + little-endian samples) —
    * the audio fixture producer, mirroring [[grayPng]]: the JDK's
    * real WAV parser ([[decodeAudio]]) round-trips these samples
    * bit-exactly. */
  def pcm16Wav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/
    * AU PCM parsers ship with every JDK — zero new dependencies):
    * returns (file type, sample rate, channels, interleaved PCM16
    * samples). 16-bit PCM passes through bit-exact; unrecognized or
    * non-PCM16 payloads return None (there is no meaningful stub
    * fallback for audio — the fake-header format carries pixels, not
    * samples). The image/audio pair [[decode]]/[[decodeAudio]] makes
    * both media modalities REAL behind the binary-column contract;
    * video remains the stubbed modality ([[sampleFrames]]). */
  def decodeAudio(media: Array[Byte])
      : Option[(String, Float, Int, Array[Short])] = {
    if (media == null) return None
    try {
      val bis = new java.io.ByteArrayInputStream(media)
      val fileType = javax.sound.sampled.AudioSystem
        .getAudioFileFormat(new java.io.ByteArrayInputStream(media))
        .getType.toString.toLowerCase(java.util.Locale.ROOT)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(bis)
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Short](n)
          val bb = java.nio.ByteBuffer.wrap(bytes).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < n) { out(i) = bb.getShort(); i += 1 }
          Some((fileType, fmt.getSampleRate, fmt.getChannels, out))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  /** Windowed audio energy: per media row, one output row per
    * `windowSamples`-sized window with the EXACT integer sum of
    * squared PCM16 samples (Long arithmetic — engine-replayable, no
    * float drift) — the audio feature-extraction face (silence
    * trimming, voice-activity gating, loudness normalization all key
    * off exactly this). Partition-local decode + window fold, zero
    * shuffle; undecodable rows produce no output rows. */
  def audioWindowEnergy(df: DataFrame, idCol: String, mediaCol: String,
      windowSamples: Int): DataFrame = {
    require(windowSamples > 0, s"windowSamples must be > 0")
    val schema = StructType(Seq(
      df.schema(df.schema.fieldIndex(idCol)),
      StructField("win", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("energy", LongType, nullable = false)))
    val enc = ExpressionEncoder(schema)
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeAudio(r.getAs[Array[Byte]](mIdx)) match {
          case Some((_, _, _, samples)) =>
            samples.grouped(windowSamples).zipWithIndex.map {
              case (w, i) =>
                var e = 0L
                var j = 0
                while (j < w.length) {
                  e += w(j).toLong * w(j).toLong; j += 1
                }
                Row(r.get(idIdx), i, w.length, e)
            }
          case None => Iterator.empty
        }
      }
    }(enc)
  }

  /** 64-bit audio fingerprint: the energy-gradient twin of the image
    * [[dHash64]] — decode PCM16, fold exact integer window energies
    * (Σ s² per `windowSamples` window, Long arithmetic), and set bit
    * b when energy(b) > energy(b+1) over the first 65 windows
    * (missing windows read energy 0, so any non-empty clip has a
    * defined fingerprint). Loudness RANK between adjacent windows
    * survives re-encoding and mild level drift where raw energies do
    * not — the same robustness argument as dHash's gradient signs —
    * and the integer-only pipeline lets a SQL oracle replay the hash
    * value-for-value (q191). Returns None for undecodable media. */
  def audioFingerprint64(media: Array[Byte],
      windowSamples: Int): Option[Long] = {
    require(windowSamples > 0, "windowSamples must be > 0")
    decodeAudio(media).map { case (_, _, _, samples) =>
      val e = new Array[Long](65)
      var w = 0
      while (w < 65) {
        var j = w * windowSamples
        val end = math.min(samples.length, (w + 1) * windowSamples)
        var s = 0L
        while (j < end) { s += samples(j).toLong * samples(j); j += 1 }
        e(w) = s
        w += 1
      }
      var fp = 0L
      var b = 0
      while (b < 64) {
        if (e(b) > e(b + 1)) fp |= 1L << b
        b += 1
      }
      fp
    }
  }

  /** Attach the [[audioFingerprint64]] of each media value —
    * partition-local batch decode + fold, zero shuffle (the
    * [[withDHash]] shape for the audio modality). Null when the media
    * fails to decode. */
  def withAudioFingerprint(df: DataFrame, mediaCol: String,
      windowSamples: Int, outCol: String = "afp"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, LongType))
    val enc = ExpressionEncoder(schema)
    val idx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val fp = audioFingerprint64(r.getAs[Array[Byte]](idx), windowSamples)
          .map(java.lang.Long.valueOf).orNull
        Row.fromSeq(r.toSeq :+ fp)
      }
    }(enc)
  }

  /** Audio near-duplicate pairs: [[audioFingerprint64]] signatures
    * through the full-recall Hamming-band blocking of
    * [[graft.dedup.Dedup.simhashPairsFromSigs]] — the audio member of
    * the per-modality dedup family (images: [[mediaNearDupsPerceptual]];
    * video: [[videoNearDups]]). Returns (id_a, id_b, hamming);
    * undecodable rows are excluded. */
  def audioNearDups(df: DataFrame, idCol: String, mediaCol: String,
      windowSamples: Int, maxHamming: Int,
      maxBucket: Int = 1000): DataFrame = {
    // lazily checkpointed: the banded pair plan consumes the signature
    // relation from more than one branch (bucket sizes + the capped
    // join), and each un-materialized consumer re-DECODES every audio
    // payload (r16 profile: two ~1.3 s 32-task jobs on q191, both
    // re-running the WAV decode). The checkpoint pins the 16-byte
    // (id, sig) rows — corpus × 16 B, the same relation the stored-
    // signature variants persist to parquet — so decode runs once.
    // Cluster trade (unreplicated executor-local blocks; executor loss
    // fails the job instead of recomputing): see the canonical note in
    // Hierarchy.closureMove — acceptable for a 16 B/row relation
    // inside one batch dedup pass; a serving deployment uses the
    // stored-signature variants, which persist to parquet.
    val sigs = withAudioFingerprint(
        df.select(col(idCol), col(mediaCol)), mediaCol, windowSamples)
      .filter(col("afp").isNotNull)
      .select(col(idCol).as("id"), col("afp").as("sig"))
      .localCheckpoint(false)
    graft.dedup.Dedup.simhashPairsFromSigs(sigs, maxHamming,
      sigBits = 64, maxBucket = maxBucket)
  }

  /** Attach a metadata struct column by decoding each payload —
    * partition-local, zero shuffle. */
  def withMeta(df: DataFrame, mediaCol: String, metaCol: String = "meta")
      : DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(metaCol, metaSchema))
    val enc = ExpressionEncoder(schema)
    val idx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = decode(r.getAs[Array[Byte]](idx)) match {
          case Some((f, w, h, p)) => Row(f, w, h, p.length.toLong)
          case None => null
        }
        Row.fromSeq(r.toSeq :+ m)
      }
    }(enc)
  }

  /** Feature extraction: fixed-width byte histogram (the stand-in for
    * an embedding model), L1-normalized, computed in partition-local
    * batches. Output: `array<float>` of length `bins`. */
  def byteHistogram(df: DataFrame, mediaCol: String, bins: Int = 16,
      outCol: String = "features"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false)))
    val enc = ExpressionEncoder(schema)
    val idx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val feat = decode(r.getAs[Array[Byte]](idx)) match {
          case Some((_, _, _, payload)) =>
            val hist = new Array[Float](bins)
            var i = 0
            while (i < payload.length) {
              hist((payload(i) & 0xff) * bins / 256) += 1f
              i += 1
            }
            val n = math.max(payload.length, 1).toFloat
            hist.map(_ / n).toSeq
          case None => null
        }
        Row.fromSeq(r.toSeq :+ feat)
      }
    }(enc)
  }

  /** Media near-duplicate pairs: [[byteHistogram]] features fed into
    * the hyperplane-LSH cosine dedup
    * ([[graft.dedup.Dedup.cosineDupPairsLsh]]) — the perceptual-hash
    * dedup shape for image/audio corpora (a real deployment swaps the
    * byte histogram for pHash/CLIP features behind the same
    * `array<float>` contract; everything downstream — LSH tables,
    * bucket caps, exact verify — is unchanged). Rows whose media
    * fails to decode carry NULL features and are excluded. `bins`
    * doubles as the LSH input dimensionality.
    */
  def mediaNearDups(df: DataFrame, idCol: String, mediaCol: String,
      threshold: Double, bins: Int = 16, tables: Int = 4): DataFrame = {
    val feats = byteHistogram(df.select(col(idCol), col(mediaCol)),
        mediaCol, bins)
      .filter(col("features").isNotNull)
      .select(col(idCol), col("features"))
    graft.dedup.Dedup.cosineDupPairsLsh(feats, idCol, "features",
      threshold, bits = math.min(16, bins), tables = tables, dim = bins)
  }

  /** 64-bit difference hash (dHash) over a decoded grayscale pixel
    * grid — the industry-standard perceptual fingerprint for image
    * dedup (Krawetz's dHash: resample to a 9×8 grid, hash the sign of
    * each horizontal gradient; near-identical images differ in a few
    * bits, so Hamming-band blocking finds them without pairwise
    * compares). Resampling here is NEAREST-NEIGHBOR
    * (`g(y,x) = pix(y·h/8, x·w/9)`, floor division) rather than the
    * conventional area/bilinear filter: bit-exact across engines and
    * integer-only, which is what lets a SQL oracle replay the hash
    * value-for-value (q178); a production build swaps bilinear in
    * behind the same 64-bit contract. Pixels are unsigned bytes,
    * row-major; grid cells beyond the payload read 0 (the stub-decode
    * contract: payload IS the pixel buffer). Bit b = y·8+x is set
    * when g(y,x) > g(y,x+1). */
  def dHash64(pixels: Array[Byte], w: Int, h: Int): Long = {
    require(w > 0 && h > 0, s"need positive dimensions, got ${w}x$h")
    @inline def pix(y: Int, x: Int): Int = {
      val yy = math.min(h - 1, y * h / 8)
      val xx = math.min(w - 1, x * w / 9)
      val idx = yy * w + xx
      if (idx < pixels.length) pixels(idx) & 0xff else 0
    }
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (pix(y, x) > pix(y, x + 1)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Attach the [[dHash64]] perceptual hash of each media value —
    * partition-local batch decode + hash, zero shuffle (the feature
    * extraction shape: the heavy codec work rides the scan). Null
    * when the media fails to decode or has degenerate dimensions. */
  def withDHash(df: DataFrame, mediaCol: String,
      outCol: String = "dhash"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(outCol, LongType))
    val enc = ExpressionEncoder(schema)
    val idx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val hash = decode(r.getAs[Array[Byte]](idx)) match {
          case Some((_, w, h, p)) if w > 0 && h > 0 =>
            java.lang.Long.valueOf(dHash64(p, w, h))
          case _ => null
        }
        Row.fromSeq(r.toSeq :+ hash)
      }
    }(enc)
  }

  /** Perceptual-hash media near-duplicates: [[withDHash]] signatures
    * through the full-recall Hamming-band blocking of
    * [[graft.dedup.Dedup.simhashPairsFromSigs]] (maxHamming+1 bands —
    * pigeonhole guarantees a pair within the radius shares a band; an
    * exact Hamming check verifies, so precision is exact). This is
    * the industry-standard image-dedup shape; the histogram-LSH
    * [[mediaNearDups]] remains the embedding-feature variant.
    * Returns (id_a, id_b, hamming). */
  def mediaNearDupsPerceptual(df: DataFrame, idCol: String,
      mediaCol: String, maxHamming: Int,
      maxBucket: Int = 1000): DataFrame = {
    // lazy checkpoint: see audioNearDups — decode once, not once per
    // pair-plan branch
    val sigs = withDHash(df.select(col(idCol), col(mediaCol)), mediaCol)
      .filter(col("dhash").isNotNull)
      .select(col(idCol).as("id"), col("dhash").as("sig"))
      .localCheckpoint(false)
    graft.dedup.Dedup.simhashPairsFromSigs(sigs, maxHamming,
      sigBits = 64, maxBucket = maxBucket)
  }

  /** "Resize" stub: truncate/pad the payload to w×h bytes, rewriting
    * the header — the partition-local transform shape of a real
    * resize. */
  def resizeStub(df: DataFrame, mediaCol: String, w: Int, h: Int): DataFrame = {
    val enc = ExpressionEncoder(df.schema)
    val idx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out = decode(r.getAs[Array[Byte]](idx)) match {
          case Some((f, _, _, p)) =>
            fakeMedia(f, w, h, java.util.Arrays.copyOf(p, w * h))
          case None => null
        }
        Row.fromSeq(r.toSeq.updated(idx, out))
      }
    }(enc)
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Split a concatenated-frame video container into per-frame
    * payloads. Two real container shapes, detected by the leading
    * bytes:
    *
    *  - MJPEG — literally concatenated JPEGs (the format IP cameras
    *    and `ffmpeg -f mjpeg` emit): frames split at each SOI marker
    *    run `FF D8 FF`. Entropy-coded JPEG data cannot contain a bare
    *    `FF D8` (in-stream `FF` is stuffed as `FF 00` or is a marker,
    *    and `D8` is not a restart/stuffing code), so the scan is exact
    *    for camera-style streams; a frame carrying an EXIF-embedded
    *    THUMBNAIL (a nested full JPEG inside APP1 — never present in
    *    MJPEG) would over-split at the thumbnail's SOI.
    *  - concatenated PNGs (the lossless twin, what the oracle fixture
    *    uses — PNG round-trips pixels bit-exactly where JPEG is
    *    lossy): frames split at each 8-byte PNG signature, which is
    *    crc-protected chunk-framed and cannot collide mid-stream.
    *
    * Anything else (including the fake-header stub format) returns
    * empty — callers fall back to [[sampleFrames]]' stub contract.
    * Partition-local, allocation = one copy per frame. */
  def splitFrames(media: Array[Byte]): IndexedSeq[Array[Byte]] = {
    if (media == null || media.length < 3) return Vector.empty
    @inline def matchesAt(pos: Int, sig: Array[Byte]): Boolean = {
      if (pos + sig.length > media.length) false
      else {
        var i = 0
        while (i < sig.length && media(pos + i) == sig(i)) i += 1
        i == sig.length
      }
    }
    val jpegSoi = Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte)
    val sig =
      if (matchesAt(0, PngSig)) PngSig
      else if (matchesAt(0, jpegSoi)) jpegSoi
      else return Vector.empty
    val starts = Vector.newBuilder[Int]
    var p = 0
    while (p <= media.length - sig.length) {
      if (media(p) == sig(0) && matchesAt(p, sig)) {
        starts += p
        p += sig.length
      } else p += 1
    }
    val ss = starts.result()
    ss.zip(ss.drop(1) :+ media.length).map { case (s, e) =>
      java.util.Arrays.copyOfRange(media, s, e)
    }
  }

  /** REAL frame sampling: every `stride`-th frame of a
    * [[splitFrames]] container becomes a row (id, frame_no, frame) —
    * frame payloads are intact single images the real [[decode]]
    * reads. Partition-local explode, zero shuffle; non-container
    * payloads produce no rows. `frame_no` is the index in the FULL
    * frame sequence (stride-invariant, so downstream joins against a
    * differently-strided sample line up). */
  def realFrames(df: DataFrame, idCol: String, mediaCol: String,
      stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    val schema = StructType(Seq(
      df.schema(df.schema.fieldIndex(idCol)),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val enc = ExpressionEncoder(schema)
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val frames = splitFrames(r.getAs[Array[Byte]](mIdx))
        (0 until frames.length by stride).iterator.map { f =>
          Row(r.get(idIdx), f, frames(f))
        }
      }
    }(enc)
  }

  /** Per-frame perceptual hashes of a concatenated-frame video in ONE
    * partition-local pass: [[splitFrames]] → real [[decode]] →
    * [[dHash64]], emitting (id, frame_no, format, width, height,
    * dhash). This is the video-dedup ingest shape — a clip's sampled
    * frame hashes feed the same Hamming-band blocking images use
    * ([[mediaNearDupsPerceptual]]); two re-encodes of the same clip
    * match frame-for-frame. Frames that fail to decode yield a row
    * with NULL format/dims/hash (observable, not dropped — a corrupt
    * frame mid-clip is a data-quality signal). Zero shuffle. */
  def videoFrameDHash(df: DataFrame, idCol: String, mediaCol: String,
      stride: Int = 1): DataFrame = {
    require(stride > 0, "stride must be positive")
    val schema = StructType(Seq(
      df.schema(df.schema.fieldIndex(idCol)),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("dhash", LongType)))
    val enc = ExpressionEncoder(schema)
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val frames = splitFrames(r.getAs[Array[Byte]](mIdx))
        (0 until frames.length by stride).iterator.map { f =>
          decode(frames(f)) match {
            case Some((fmt, w, h, p)) if w > 0 && h > 0 =>
              Row(r.get(idIdx), f, fmt, w, h,
                java.lang.Long.valueOf(dHash64(p, w, h)))
            case _ => Row(r.get(idIdx), f, null, null, null, null)
          }
        }
      }
    }(enc)
  }

  /** Clip-level video near-duplicates from sampled frame hashes: two
    * clips pair when at least `minMatches` of their SAME-INDEX
    * sampled frames are within `maxHamming` dHash bits — the standard
    * re-encode/re-upload dedup shape (two encodes of one clip match
    * frame-for-frame; a trailer sharing one still does not clear
    * `minMatches`). Returns (id_a, id_b, n_frames, sum_ham).
    *
    * Scale shape: ONE partition-local pass decodes and hashes the
    * sampled frames ([[videoFrameDHash]]); per (frame_no, block) the
    * 64-bit hashes bucket by `maxHamming + 1` pigeonhole blocks (full
    * recall within the radius — the
    * [[graft.dedup.Dedup.simhashPairsFromSigs]] guarantee, keyed
    * additionally by frame index so only aligned frames ever meet),
    * exact Hamming verifies every candidate (precision exact), and
    * the per-pair frame count is one aggregation on (id_a, id_b).
    * Bucket sizes ride the same hash shuffle as an aggregate joined
    * back — no wide sort — and degenerate buckets (black frames,
    * test-pattern stills shared by thousands of clips) are dropped by
    * `maxBucket` before they can expand quadratically.
    *
    * `maxBucket` is a RECALL knob and its drops are observable, not
    * silent (the [[graft.dedup.Dedup.pairsFromBuckets]] contract):
    * pass an [[org.apache.spark.sql.Observation]] and read
    * `dropped_rows` (frame-hash rows in over-cap buckets) and
    * `max_bucket_size` after the action — a nonzero counter means
    * some aligned-frame candidates were never generated, so a missing
    * pair at scale is the knob, not a bug. */
  def videoNearDups(df: DataFrame, idCol: String, mediaCol: String,
      stride: Int = 1, maxHamming: Int = 3, minMatches: Int = 2,
      maxBucket: Int = 1000,
      obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"full-recall blocking supports maxHamming in [0, 7], got $maxHamming")
    require(minMatches >= 1, "minMatches must be >= 1")
    // lazy checkpoint: see audioNearDups — the sizes branch and both
    // self-join sides otherwise each re-split + re-decode every frame
    val fh = videoFrameDHash(df, idCol, mediaCol, stride)
      .filter(col("dhash").isNotNull)
      .select(col(idCol).as("id"), col("frame_no"), col("dhash"))
      .localCheckpoint(false)
    val nBlocks = maxHamming + 1
    val width = 64 / nBlocks
    val mask = (1L << width) - 1
    val bucketed = fh.select(col("id"), col("frame_no"), col("dhash"),
      posexplode(array((0 until nBlocks).map(t =>
        shiftrightunsigned(col("dhash"), t * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("block", "bucket")))
    val keys = Seq("frame_no", "block", "bucket")
    val sizes = bucketed.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val observed = obs.fold(sizes)(o => sizes.observe(o,
      sum(when(col("__n") > maxBucket, col("__n")).otherwise(0L))
        .as("dropped_rows"),
      max(col("__n")).as("max_bucket_size")))
    val capped = bucketed
      .join(observed.filter(col("__n") >= 2 && col("__n") <= maxBucket), keys)
      .select(col("frame_no"), col("block"), col("bucket"),
        col("id"), col("dhash"))
    val cands = capped
      .select(col("frame_no"), col("block"), col("bucket"),
        col("id").as("id_a"), col("dhash").as("h_a"))
      .join(capped.select(col("frame_no"), col("block"), col("bucket"),
        col("id").as("id_b"), col("dhash").as("h_b")), keys)
      .filter(col("id_a") < col("id_b"))
      .select(col("frame_no"), col("id_a"), col("id_b"),
        col("h_a"), col("h_b"))
      .distinct() // across blocks: one row per aligned candidate frame
    cands
      .withColumn("ham",
        graft.sim.Similarity.hamming64(col("h_a"), col("h_b")).cast("long"))
      .filter(col("ham") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_frames"), sum(col("ham")).as("sum_ham"))
      .filter(col("n_frames") >= minMatches)
  }

  /** Frame sampling for "video" payloads: every `stride`-th
    * `frameBytes`-sized slice becomes a row (id, frame_no, frame).
    * The explode happens partition-locally; downstream repartition
    * decides the parallelism of per-frame work. */
  def sampleFrames(df: DataFrame, idCol: String, mediaCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    val schema = StructType(Seq(
      df.schema(df.schema.fieldIndex(idCol)),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val enc = ExpressionEncoder(schema)
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        decode(r.getAs[Array[Byte]](mIdx)) match {
          case Some((_, _, _, p)) =>
            val nFrames = p.length / frameBytes
            (0 until nFrames by stride).iterator.map { f =>
              Row(r.get(idIdx), f,
                java.util.Arrays.copyOfRange(p, f * frameBytes,
                  (f + 1) * frameBytes))
            }
          case None => Iterator.empty
        }
      }
    }(enc)
  }
}
