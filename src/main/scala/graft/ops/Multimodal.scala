package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch decoders.
  *
  * The Spark-side architecture here is real and tested — schema, typed
  * Dataset boundary, partition-batched iteration (the Scala analog of a
  * pandas-batched UDF), output size control. Decoding is REAL for every
  * format the JVM ships a codec for: PPM by hand, PNG/GIF/BMP/JPEG via
  * `javax.imageio`, WAV/PCM audio via `javax.sound.sampled`; and
  * [[resize]] re-encodes actual pixels (deterministic nearest-neighbor
  * + PNG). Only container-codec formats the JVM lacks (video, non-WAV
  * audio) fall back to a clearly-marked deterministic stub / null
  * sentinels, and swapping those for e.g. ffmpeg bindings changes only
  * [[decodeOne]]'s fallback branch, not the pipeline shape.
  */
object Multimodal {

  // ImageIO's default stream cache spills every image being (de)coded to a
  // temp FILE — per-row disk I/O on the decode hot path. All media here
  // arrives as in-memory byte arrays, so cache in memory. Runs once per
  // executor JVM (object init on first use inside the decode closure).
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed decoded-features row (what a real image decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      content_sha: String,
      width: Int,
      height: Int,
      channels: Int,
      histogram: Array[Double])

  /** Attach an opaque binary media column (in the test harness the
    * document text stands in for real media bytes; real sources read
    * `binaryFile` / parquet binary columns).
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"))

  /** Per-partition batch decode of binary media into typed features.
    *
    * Real decode paths: PPM (P6) via the hand-rolled header parser
    * ([[decodePpm]] — the format needs no codec), and PNG/GIF/BMP/JPEG
    * via `javax.imageio` ([[decodeImage]] — all four decoders ship in
    * the JDK, no container codecs needed). Anything else (video,
    * non-WAV audio) falls back to the deterministic STUB (dimensions
    * from the content hash, histogram over raw bytes); swapping the stub
    * for e.g. ffmpeg bindings changes only `decodeOne`'s fallback
    * branch, not the pipeline shape.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val s2 = media.sparkSession; import s2.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // batch-scoped setup would construct the codec once per partition
        batch.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }

  private def decodeOne(id: Long, bytes: Array[Byte]): MediaFeatures =
    decodePpm(id, bytes)
      .orElse(decodeImage(id, bytes))
      .getOrElse(decodeStub(id, bytes))

  /** Sniff-and-read through `javax.imageio`: Some(image) only for bytes
    * carrying a PNG/GIF/BMP/JPEG magic number that the JDK codec actually
    * decodes. The magic-number sniff keeps ImageIO off the hot path for
    * non-image bytes — the common case in a mixed corpus is text, which
    * must not pay a codec probe per row.
    */
  private def readImageIO(bytes: Array[Byte])
      : Option[java.awt.image.BufferedImage] = {
    def has(at: Int, sig: Int*): Boolean =
      bytes.length > at + sig.length &&
        sig.zipWithIndex.forall { case (b, i) => (bytes(at + i) & 0xff) == b }
    val sniffed = has(0, 0x89, 'P', 'N', 'G') || // PNG
      has(0, 'G', 'I', 'F', '8') ||              // GIF87a/89a
      (has(0, 'B', 'M') && bytes.length >= 26) || // BMP
      has(0, 0xff, 0xd8, 0xff)                   // JPEG (JDK codec)
    if (!sniffed) None
    else
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Real decoder for the JDK's image formats (PNG, GIF, BMP, JPEG) via
    * [[readImageIO]]: dimensions + channel count from the decoded image,
    * 4-bin luminance histogram over the actual pixels (integer Rec.601
    * weights, so the binning is deterministic across JVMs).
    */
  private[graft] def decodeImage(id: Long, bytes: Array[Byte])
      : Option[MediaFeatures] = {
    readImageIO(bytes).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val hist = new Array[Double](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(lum >> 6) += 1.0
          x += 1
        }
        y += 1
      }
      val total = math.max(1.0, w.toDouble * h)
      MediaFeatures(id, bytes.length, md5Hex(bytes), w, h,
        img.getColorModel.getNumComponents, hist.map(_ / total))
    }
  }

  /** Parse a binary-PPM header: Some((w, h, rasterOffset)) for a
    * well-formed `P6 <w> <h> <maxval>` prefix (whitespace-separated ASCII
    * tokens, `#` comments, 8-bit maxval), None otherwise. Headers are
    * UNTRUSTED bytes: dimensions wildly beyond what the payload could
    * carry (a hostile `P6 1000000 1000000 255` over a few bytes) are
    * rejected here, so no caller ever sizes an allocation from them —
    * modestly truncated rasters (the documented read-as-zero contract)
    * still pass via the slack term.
    */
  private def parsePpmHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def skipSpace(): Unit = {
      var in = true
      while (in && i < bytes.length) {
        val c = bytes(i).toChar
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else in = false
      }
    }
    def int(): Option[Int] = {
      skipSpace()
      val start = i
      while (i < bytes.length && bytes(i).toChar.isDigit) i += 1
      if (i == start || i - start > 7) None
      else Some(new String(bytes, start, i - start).toInt)
    }
    for {
      w <- int(); h <- int(); maxVal <- int()
      if w > 0 && h > 0 && maxVal > 0 && maxVal < 256
      // untrusted-dims guard (all in Long — w*h alone can overflow Int):
      // the claimed raster must be within a slack page of the payload
      if w.toLong * h <= (bytes.length.toLong - i) / 3 + 4096
      // exactly one whitespace byte separates the header from the raster
      if i < bytes.length && bytes(i).toChar.isWhitespace
    } yield (w, h, i + 1)
  }

  private[graft] def decodePpm(id: Long, bytes: Array[Byte])
      : Option[MediaFeatures] = {
    parsePpmHeader(bytes).map { case (w, h, off) =>
      val n = math.min(w.toLong * h * 3, (bytes.length - off).toLong).toInt
      val hist = new Array[Double](4)
      var p = off
      while (p < off + n) { hist((bytes(p) & 0xff) >> 6) += 1.0; p += 1 }
      val total = math.max(1.0, n.toDouble)
      MediaFeatures(id, bytes.length, md5Hex(bytes), w, h, 3,
        hist.map(_ / total))
    }
  }

  /** PPM raster as a `BufferedImage` (RGB triplets row-major; any bytes a
    * truncated raster is missing read as 0) — lets [[resize]] treat PPM
    * like the ImageIO formats.
    */
  private def ppmImage(bytes: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    parsePpmHeader(bytes).flatMap { case (w, h, off) =>
      // allocation cap on top of the header's payload-plausibility guard:
      // a raster this size (16M pixels = 64 MB of ARGB) is the most one
      // hostile-but-plausible row may pin per decoder thread
      if (w.toLong * h > (1L << 24)) None
      else {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var p = 0
        val n = w * h
        while (p < n) {
          val b = off.toLong + p.toLong * 3 // Long: off + p*3 can wrap Int
          def at(k: Int): Int =
            if (b + k < bytes.length) bytes((b + k).toInt) & 0xff else 0
          img.setRGB(p % w, p / w, (at(0) << 16) | (at(1) << 8) | at(2))
          p += 1
        }
        Some(img)
      }
    }

  /** 64-bit difference hash (dHash) of one image: NN-sample a 9×8
    * integer-luma grid (the [[resizeOne]] index math, `x·w/9`, `y·h/8`)
    * and set bit `y·8 + x` when the right neighbor is STRICTLY
    * brighter. Every step is integer arithmetic on decoded pixels, so
    * the hash is engine-replayable wherever the pixels are (PPM bytes
    * are raw; a SQL oracle recomputes the same grid from the same
    * bytes). None for undecodable media — perceptual identity of junk
    * is meaningless, stub features are not.
    */
  private[graft] def dhashOne(bytes: Array[Byte]): Option[Long] =
    try {
      readImageIO(bytes).orElse(ppmImage(bytes)).map { img =>
        val w = img.getWidth; val h = img.getHeight
        def lum(x: Int, y: Int): Int = {
          val rgb = img.getRGB(x * w / 9, y * h / 8)
          (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
        }
        var hash = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (lum(x + 1, y) > lum(x, y)) hash |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        hash
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** (doc_id, dhash) for every decodable image — the perceptual
    * fingerprint column image dedup runs on: re-encodes, minor recrops,
    * and palette shifts move few bits where a content change moves
    * many. Partition-batched narrow decode, undecodable rows dropped.
    */
  def imageDhash(media: DataFrame): DataFrame = {
    val s2 = media.sparkSession; import s2.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        dhashOne(bytes).map(h => (id, h))
      })
      .toDF("doc_id", "dhash")
  }

  /** Near-duplicate image pairs: all (id1 < id2) with
    * `popcount(dhash1 XOR dhash2) <= maxHamming`, found WITHOUT an
    * all-pairs pass — the [[graft.ops.Dedup]] SimHash discipline
    * applied to the perceptual hash: split the 64 bits into
    * `maxHamming + 1` bands (pigeonhole: any qualifying pair agrees
    * exactly on at least one band), bucket on (band, value), expand
    * inside buckets, then exact `bit_count` re-scoring kills the false
    * candidates. Requires `maxHamming <= 15` (16 bands of 4 bits would
    * collide everything; 4 bands of 16 bits hold to 3, 8 bands of 8
    * bits to 7 — band width adapts).
    *
    * Shape at 100 TB: one decode scan → one (band, value) bucket
    * shuffle → in-bucket expansion + narrow exact filter. Never
    * images², never pixels past the decode.
    */
  def dhashPairs(media: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming=$maxHamming out of [0, 15]")
    val bands = maxHamming + 1
    val width = 64 / bands // >= 4 given the cap
    // NB (1L << 64) wraps to 1 in Scala/Java: the single-band exact-dup
    // case (maxHamming = 0) must mask with -1, not (1 << 64) - 1 = 0,
    // or every image lands in ONE bucket
    val mask = if (width == 64) -1L else (1L << width) - 1
    val hashed = imageDhash(media)
    val banded = hashed.select(col("doc_id"), col("dhash"),
        explode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
          s"struct(b AS band, shiftrightunsigned(dhash, b * $width) & " +
          s"${mask}L AS v))")).as("bv"))
      .select(col("bv.band"), col("bv.v"),
        struct(col("doc_id"), col("dhash")).as("p"))
    Dedup.bucketPairsOf(banded, Seq("band", "v"), col("p"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        expr("bit_count(a.dhash ^ b.dhash)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Typed decoded-audio row (sibling of [[MediaFeatures]] for the audio
    * modality: rate/channels/frames instead of pixel dimensions).
    */
  final case class AudioFeatures(
      doc_id: Long,
      n_bytes: Int,
      content_sha: String,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      histogram: Array[Double])

  /** Per-partition batch decode of binary audio. WAV/PCM decodes for REAL
    * via `javax.sound.sampled` (pure JVM, headless — parsing needs no
    * audio device); anything else yields nulls in the typed columns rather
    * than fake values (audio has no honest content-hash stub: absent
    * metadata must read as absent).
    */
  def decodeAudioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val s2 = media.sparkSession; import s2.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeWav(id, bytes).getOrElse(
          AudioFeatures(id, bytes.length, md5Hex(bytes), -1, -1, -1L,
            Array.fill(4)(0.0)))
      })
  }

  /** Real WAV (RIFF/PCM) decoder: sample rate / channel count / frame
    * count from the parsed header, 4-bin amplitude histogram over the
    * actual samples (8-bit PCM binned on the unsigned byte, wider PCM on
    * the unsigned high-order byte — deterministic integer arithmetic, no
    * float resampling). Magic-number sniff keeps the codec probe off
    * non-audio rows.
    */
  private[graft] def decodeWav(id: Long, bytes: Array[Byte])
      : Option[AudioFeatures] = {
    if (bytes.length < 44 || bytes(0) != 'R' || bytes(1) != 'I' ||
      bytes(2) != 'F' || bytes(3) != 'F' || bytes(8) != 'W' ||
      bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val bytesPerSample = math.max(1, (fmt.getSampleSizeInBits + 7) / 8)
        val signed = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val data = ais.readAllBytes()
        val hist = new Array[Double](4)
        var i = 0
        var n = 0L
        while (i + bytesPerSample <= data.length) {
          // unsigned amplitude of the sample's high-order byte
          val hi = if (fmt.isBigEndian) data(i) else data(i + bytesPerSample - 1)
          val u = if (signed) (hi ^ 0x80) & 0xff else hi & 0xff
          hist(u >> 6) += 1.0
          n += 1
          i += bytesPerSample
        }
        val total = math.max(1.0, n.toDouble)
        Some(AudioFeatures(id, bytes.length, md5Hex(bytes),
          fmt.getSampleRate.toInt, fmt.getChannels, ais.getFrameLength,
          hist.map(_ / total)))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  final case class AudioBlock(doc_id: Long, block: Int, n_samples: Int,
      energy: Long, zcr: Long)

  /** Per-block audio features over REAL decoded PCM — the
    * feature-extraction tier an audio corpus runs before silence
    * trimming, voice-activity gating, or fingerprint dedup:
    *   - `energy`: Σ (u − 128)² over the block's unsigned high-byte
    *     samples (exact integer — silence ≈ 0, clipping ≈ 128²·n);
    *   - `zcr`: strict sign alternations around the midline within the
    *     block (noise/fricatives high, tones low, DC zero).
    * Blocks are `blockLen` samples; the trailing partial block reports
    * with its own `n_samples`. Undecodable media yields no rows.
    *
    * Shape at 100 TB: partition-batched narrow decode → 1→N block
    * rows; no shuffle, no UDF registry, integers end to end.
    */
  def audioBlockFeatures(media: DataFrame,
      blockLen: Int): Dataset[AudioBlock] = {
    require(blockLen >= 2, s"blockLen=$blockLen must be >= 2")
    val s2 = media.sparkSession; import s2.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        wavSamplesU8(bytes).toSeq.flatMap { u =>
          u.grouped(blockLen).zipWithIndex.map { case (blk, bi) =>
            var energy = 0L
            var zcr = 0L
            var i = 0
            while (i < blk.length) {
              val d = blk(i) - 128
              energy += d.toLong * d
              if (i > 0 && (blk(i - 1) - 128).toLong * d < 0) zcr += 1
              i += 1
            }
            AudioBlock(id, bi, blk.length, energy, zcr)
          }
        }
      })
  }


  final case class ResampledBlock(doc_id: Long, block: Int,
      n_samples: Int, energy_scaled: Long)

  /** Rational PCM resampling (up `L` / down `M`) by linear
    * interpolation over REAL decoded WAV samples, with per-block energy
    * of the resampled stream — the rate-normalization pass an audio
    * corpus runs before fingerprinting or feature extraction, since
    * energy/ZCR features only compare across clips at one rate.
    *
    * All arithmetic is EXACT integer: output sample j sits at source
    * position j·M/L, i.e. `i0 = (j·M) div L` with remainder `rem`, and
    * the sample SCALED BY L is `s[i0]·(L − rem) + s[i0+1]·rem` — no
    * float ever, so any engine replays it bit-for-bit from the same
    * bytes. `energy_scaled` is Σ (u_scaled − 128·L)² over the block
    * (the [[audioBlockFeatures]] energy, in the ×L domain), summed with
    * `Math.addExact`/`multiplyExact` so a rate large enough to overflow
    * the ×L energy domain fails loudly instead of wrapping. Output
    * length is `(n−1)·L div M + 1`; undecodable media yields no rows.
    *
    * Shape at 100 TB: partition-batched narrow decode → 1→N block
    * rows; no shuffle, no UDF registry, integers end to end.
    */
  def audioResampleBlocks(media: DataFrame, up: Int, down: Int,
      blockLen: Int): Dataset[ResampledBlock] = {
    require(up >= 1 && down >= 1, s"bad rational rate $up/$down")
    require(blockLen >= 2, s"blockLen=$blockLen must be >= 2")
    val s2 = media.sparkSession; import s2.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        wavSamplesU8(bytes).toSeq.flatMap { u =>
          if (u.length < 2) Seq.empty
          else {
            val nOutL = (u.length - 1).toLong * up / down + 1L
            if (nOutL > Int.MaxValue)
              throw new IllegalArgumentException(
                s"audioResampleBlocks: $nOutL output samples from " +
                  s"${u.length} at $up/$down overflows an array — " +
                  "chunk the media first")
            val nOut = nOutL.toInt
            val mid = 128L * up
            val out = new Array[Long](nOut)
            var j = 0
            while (j < nOut) {
              val num = j.toLong * down
              val i0 = (num / up).toInt
              val rem = num % up
              val s0 = u(i0).toLong
              out(j) =
                if (rem == 0L || i0 + 1 >= u.length) s0 * up
                else s0 * (up - rem) + u(i0 + 1) * rem
              j += 1
            }
            out.grouped(blockLen).zipWithIndex.map { case (blk, bi) =>
              // exact arithmetic is the operator's contract, so the
              // energy sum must fail loudly, not wrap: |d| <= 127·up,
              // so d² alone overflows past up ≈ 2.4e7 and a long block
              // can push the sum over 2^63 well before that
              var energy = 0L
              var i = 0
              while (i < blk.length) {
                val d = blk(i) - mid
                energy = Math.addExact(energy, Math.multiplyExact(d, d))
                i += 1
              }
              ResampledBlock(id, bi, blk.length, energy)
            }.toSeq
          }
        }
      })
  }

  /** The unsigned high-order byte of every PCM sample in a WAV —
    * [[decodeWav]]'s sample walk, returned raw for feature extraction.
    */
  private[graft] def wavSamplesU8(bytes: Array[Byte])
      : Option[Array[Int]] = {
    if (bytes.length < 44 || bytes(0) != 'R' || bytes(1) != 'I' ||
      bytes(2) != 'F' || bytes(3) != 'F' || bytes(8) != 'W' ||
      bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val bytesPerSample = math.max(1, (fmt.getSampleSizeInBits + 7) / 8)
        val signed = fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val data = ais.readAllBytes()
        val out = new Array[Int](data.length / bytesPerSample)
        var i = 0
        var k = 0
        while (i + bytesPerSample <= data.length) {
          val hi =
            if (fmt.isBigEndian) data(i) else data(i + bytesPerSample - 1)
          out(k) = if (signed) (hi ^ 0x80) & 0xff else hi & 0xff
          i += bytesPerSample
          k += 1
        }
        Some(out)
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode raw 8-bit unsigned PCM samples as a canonical 44-byte-header
    * WAV. Test-fixture generator for the real [[decodeWav]] path: the
    * decoded amplitude histogram is exactly the histogram of the input
    * bytes, so any engine can replay it from the source bytes.
    */
  private[graft] def encodePcmWav(samples: Array[Byte], sampleRate: Int,
      channels: Int = 1): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
      .put("WAVEfmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels) // byte rate (8-bit)
      .putShort(channels.toShort).putShort(8) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(samples.length)
      .put(samples)
    bb.array()
  }

  /** Encode grayscale byte values as a truecolor PNG (r=g=b=value), via
    * the JDK's pure-JVM PNG writer. Test-fixture generator for the real
    * [[decodeImage]] path: with equal channels the integer Rec.601
    * luminance is exactly the input byte, so downstream histograms are
    * replayable from the original bytes by any engine. Row-major pixels;
    * `gray` must hold w*h bytes.
    */
  private[graft] def encodeGrayAsRgbPng(gray: Array[Byte], w: Int,
      h: Int): Array[Byte] = {
    require(gray.length == w * h, s"need ${w * h} pixels, got ${gray.length}")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < gray.length) {
      val c = gray(i) & 0xff
      img.setRGB(i % w, i / w, (c << 16) | (c << 8) | c)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val sha = md5Hex(bytes)
    // fake dimensions from content hash; 4-bin histogram over raw bytes
    val w = 64 + (java.lang.Long.parseLong(sha.substring(0, 4), 16) % 192).toInt
    val h = 64 + (java.lang.Long.parseLong(sha.substring(4, 8), 16) % 192).toInt
    val hist = new Array[Double](4)
    bytes.foreach(b => hist(((b & 0xff) >> 6)) += 1.0)
    val total = math.max(1.0, bytes.length.toDouble)
    MediaFeatures(id, bytes.length, sha, w, h, 3, hist.map(_ / total))
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** REAL pixel resize of one image: decode (ImageIO formats or PPM),
    * deterministic nearest-neighbor downscale so the longer side fits
    * `maxSide` (integer arithmetic throughout: dst (x,y) samples src
    * (x*w/dw, y*h/dh), dims dw = w*maxSide/max(w,h) floored, min 1 — any
    * engine replays which source pixels survive), re-encode as PNG.
    * Already-small images pass through byte-identical; undecodable bytes
    * yield None (resizing what we can't decode would be a lie).
    */
  private[graft] def resizeOne(bytes: Array[Byte],
      maxSide: Int): Option[Array[Byte]] = try {
    readImageIO(bytes).orElse(ppmImage(bytes)).map { img =>
      val w = img.getWidth; val h = img.getHeight
      val mx = math.max(w, h)
      if (mx <= maxSide) bytes
      else {
        val dw = math.max(1, w * maxSide / mx)
        val dh = math.max(1, h * maxSide / mx)
        val out = new java.awt.image.BufferedImage(
          dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < dh) {
          val sy = y * h / dh
          var x = 0
          while (x < dw) {
            out.setRGB(x, y, img.getRGB(x * w / dw, sy))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }
  } catch {
    // one hostile row must degrade to the pass-through contract (row kept,
    // resized = false), never fail the task — mirrors decodeImage/decodeWav
    case scala.util.control.NonFatal(_) => None
  }

  /** Per-partition batch resize: each decodable image's media bytes are
    * replaced by the nearest-neighbor-downscaled PNG ([[resizeOne]]);
    * rows the JVM cannot decode pass through unchanged, as do decodable
    * images already within `maxSide`. `resized` is true iff the media
    * BYTES were actually replaced — a count over it is a count of
    * rewritten rows, not of decodable ones.
    */
  def resizeMedia(media: DataFrame, maxSide: Int): DataFrame = {
    require(maxSide > 0, s"maxSide must be positive, got $maxSide")
    val s2 = media.sparkSession; import s2.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        resizeOne(bytes, maxSide) match {
          // pass-throughs return the input array itself, so the eq check
          // costs nothing on the already-fits path
          case Some(out) => (id, out, !(out eq bytes))
          case None      => (id, bytes, false)
        }
      })
      .toDF("doc_id", "media", "resized")
  }

  /** Resized-image features: the full decode → NN-downscale → PNG
    * re-encode → decode-again loop, emitting the NEW dimensions, NEW
    * content hash, and the histogram recomputed over the resized pixels.
    */
  def resize(media: DataFrame, maxSide: Int): Dataset[MediaFeatures] =
    decodeFeatures(resizeMedia(media, maxSide))

  /** Typed per-frame row emitted by the REAL container demux
    * ([[decodeFrames]]).
    */
  final case class FrameFeatures(
      doc_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      histogram: Array[Double])

  /** REAL frame sampling for the one multi-frame container the bare JVM
    * ships a demuxer for: animated GIF via `javax.imageio`'s sequence
    * reader. Every `everyN`-th stored frame becomes a row with its
    * decoded dimensions and 4-bin luminance histogram (same integer
    * Rec.601 binning as [[decodeImage]]). Rows whose bytes are not a
    * parseable GIF emit NOTHING — fabricating frames for undemuxable
    * media would be a lie; route codec-less formats through
    * [[sampleFrames]]' byte-chunking instead. Frames are measured over
    * their STORED rasters (a size-optimized GIF stores partial-frame
    * updates; full-frame GIFs — including everything
    * [[encodeGrayFramesAsGif]] emits — measure the whole frame).
    * Partition-batched like the other decoders; output is a narrow 1→N
    * expansion with no shuffle.
    */
  def decodeFrames(media: DataFrame, everyN: Int): Dataset[FrameFeatures] = {
    require(everyN > 0, s"everyN=$everyN must be positive")
    val s2 = media.sparkSession; import s2.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeGifFrames(id, bytes, everyN)
      })
  }

  private[graft] def decodeGifFrames(id: Long, bytes: Array[Byte],
      everyN: Int): Seq[FrameFeatures] = {
    if (bytes.length < 6 || bytes(0) != 'G' || bytes(1) != 'I' ||
      bytes(2) != 'F' || bytes(3) != '8') return Nil
    try {
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n by everyN).map { i =>
          val img = reader.read(i)
          val w = img.getWidth; val h = img.getHeight
          val hist = new Array[Double](4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 +
                ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              hist(lum >> 6) += 1.0
              x += 1
            }
            y += 1
          }
          val total = math.max(1.0, w.toDouble * h)
          FrameFeatures(id, i, w, h, hist.map(_ / total))
        }
      } finally { iis.close(); reader.dispose() }
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Encode grayscale rasters as one animated GIF (256-gray palette, so
    * the round trip is LOSSLESS: decoded integer Rec.601 luminance ==
    * the source byte, [[encodeGrayAsRgbPng]]'s invariant extended to the
    * multi-frame container). Test-fixture generator for the real
    * [[decodeFrames]] demux; each frame must hold w*h bytes.
    */
  private[graft] def encodeGrayFramesAsGif(frames: Seq[Array[Byte]],
      w: Int, h: Int): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == w * h),
      s"every frame needs ${w * h} pixels")
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { fr =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        img.getRaster.setDataElements(0, 0, w, h, fr.clone())
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Byte-chunk "frame sampling" for codec-less video-like media: emit
    * every `everyN`-th chunk of the byte stream as a frame row — the
    * honest stand-in where no JVM demuxer exists (real demux for
    * animated GIF lives in [[decodeFrames]]).
    */
  def sampleFrames(media: DataFrame, chunkBytes: Int, everyN: Int): DataFrame =
    media
      .select(col("doc_id"), col("media"),
        explode(expr(
          s"sequence(0, greatest(0, cast((length(media) - 1) / $chunkBytes AS INT)))"))
          .as("chunk"))
      .where(col("chunk") % everyN === 0)
      .select(col("doc_id"), col("chunk"),
        expr(s"substring(media, chunk * $chunkBytes + 1, $chunkBytes)")
          .as("frame_bytes"))
}
