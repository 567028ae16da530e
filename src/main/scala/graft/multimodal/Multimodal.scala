package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed partition-wise.
  *
  * The Spark-side plumbing is real — schema, encoders, per-partition
  * batched iteration (the JVM analogue of `mapInPandas` batch processing),
  * partitioned writes. The decode layer handles one REAL container format
  * per modality with zero libraries — BMP (24-bit uncompressed) for image
  * and WAV (RIFF 16-bit PCM) for audio, both header+raw-bytes formats
  * parsed in [[decodeBmp]]/[[decodeWavPcm]] — and falls back to the
  * clearly marked deterministic STUB ([[decodeStub]]) for payloads in any
  * other format (the jpeg/mp3-class codec libraries are not in this
  * build). Real-path correctness is oracle-gated by q57 against
  * fixtures/media/expected.csv, which an independent generator
  * (scripts/make_media_fixtures.py) computes from the same formulas that
  * produced the fixture bytes.
  *
  * Scale design: payloads never pass through a shuffle unless the caller
  * repartitions; feature extraction is a narrow mapPartitions (no
  * exchange); frame sampling explodes rows but keeps partitioning.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sampleRate: Int,
                       durationMs: Long, codec: String)
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, dim: Int,
                           features: Array[Float])
  case class FrameRow(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Deterministic synthetic media table (no external fixtures needed). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val payload = Array.tabulate(256)(i => ((id * 31 + i * 7) % 251).toByte)
      val meta = kind match {
        case "image" => MediaMeta(64, 64, 0, 0L, "fakepng")
        case "audio" => MediaMeta(0, 0, 16000, 2000L, "fakewav")
        case _       => MediaMeta(32, 32, 0, 4000L, "fakemp4")
      }
      MediaRow(id, kind, payload, meta)
    }
  }

  /** Decoded image: row-major from the TOP-left pixel, 0xRRGGBB packed. */
  case class DecodedImage(width: Int, height: Int, rgb: Array[Int])
  /** Decoded audio: channel-interleaved 16-bit PCM samples. */
  case class DecodedAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** REAL image decode for the one library-free container format: BMP,
    * 24-bit uncompressed, BITMAPINFOHEADER-or-later. Handles the two
    * on-disk quirks a naive reader gets wrong — rows padded to 4 bytes
    * and bottom-up row order (positive height) — plus BGR channel order.
    * None for anything that isn't exactly this format (caller falls back
    * to [[decodeStub]]). */
  def decodeBmp(b: Array[Byte]): Option[DecodedImage] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOffset = i32(b, 10)
    val headerSize = i32(b, 14)
    val width = i32(b, 18)
    val heightRaw = i32(b, 22)
    val bpp = u16(b, 28)
    val compression = i32(b, 30)
    if (headerSize < 40 || bpp != 24 || compression != 0) return None
    if (width <= 0 || heightRaw == 0) return None
    val bottomUp = heightRaw > 0
    val height = math.abs(heightRaw)
    // stride in LONG: a crafted ~700M-pixel width would overflow the int
    // stride negative and sneak past the bounds check below
    val rowStride64 = (width.toLong * 3 + 3) / 4 * 4
    if (dataOffset < 0 || rowStride64 > Int.MaxValue ||
      dataOffset.toLong + rowStride64 * height > b.length)
      return None
    val rowStride = rowStride64.toInt
    val rgb = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      var o = dataOffset + srcRow * rowStride
      var x = 0
      while (x < width) {
        rgb(y * width + x) =
          ((b(o + 2) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
        o += 3
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(width, height, rgb))
  }

  /** REAL audio decode for the one library-free container format: WAV,
    * RIFF with 16-bit PCM. Walks the chunk list (fmt can precede or
    * follow junk chunks; chunks are word-aligned) instead of assuming
    * the canonical 44-byte layout. None unless both a PCM-16 fmt chunk
    * and a data chunk are present. */
  def decodeWavPcm(b: Array[Byte]): Option[DecodedAudio] = {
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var o = 12
    var rate = -1
    var channels = -1
    var pcm16 = false
    var samples: Array[Short] = null
    while (o + 8 <= b.length) {
      val id = tag(o)
      val size = i32(b, o + 4)
      // LONG arithmetic: a near-Int.MaxValue size would overflow the
      // int sum negative and pass the bound
      if (size < 0 || o.toLong + 8 + size > b.length) return None
      if (id == "fmt " && size >= 16) {
        pcm16 = u16(b, o + 8) == 1 && u16(b, o + 8 + 14) == 16
        channels = u16(b, o + 8 + 2)
        rate = i32(b, o + 8 + 4)
      } else if (id == "data") {
        val n = size / 2
        samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = ((b(o + 8 + 2 * i) & 0xff) |
            ((b(o + 8 + 2 * i + 1) & 0xff) << 8)).toShort
          i += 1
        }
      }
      o += 8 + size + (size & 1) // chunks are word-aligned
    }
    // samples.nonEmpty: a well-formed data chunk of size 0 would
    // otherwise decode to an empty array and crash every consumer that
    // reads samples(0) (decodeSummary's first_unit, energy hashing) —
    // treat zero-sample audio as undecodable like any other bad payload.
    if (pcm16 && rate > 0 && channels > 0 && samples != null && samples.nonEmpty)
      Some(DecodedAudio(rate, channels, samples))
    else None
  }

  /** Mean-pool `values` into `dim` feature windows (the shared shape of
    * the real and stub feature paths). */
  private def pool(values: Array[Float], dim: Int): Array[Float] = {
    val window = math.max(1, values.length / dim)
    Array.tabulate(dim) { j =>
      val from = j * window
      val until = math.min(values.length, (j + 1) * window)
      if (from >= until) 0f
      else {
        var s = 0f
        var i = from
        while (i < until) { s += values(i); i += 1 }
        s / (until - from)
      }
    }
  }

  /** Feature vector from a payload: REAL decode when the bytes are a
    * format we parse natively (BMP → pooled grayscale, WAV → pooled
    * absolute amplitude, both in [0,1]), [[decodeStub]] otherwise. */
  def decodeFeatures(payload: Array[Byte], dim: Int): Array[Float] =
    decodeBmp(payload) match {
      case Some(img) =>
        pool(img.rgb.map { p =>
          (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / (3f * 255f)
        }, dim)
      case None => decodeWavPcm(payload) match {
        case Some(au) =>
          pool(au.samples.map(s => math.abs(s.toInt) / 32768f), dim)
        case None => decodeStub(payload, dim)
      }
    }

  /** STUB — stands in for the real image/audio decode + model forward
    * pass (libraries absent in this container). Deterministic: feature j
    * is a scaled byte-window sum, so tests and oracles can rely on exact
    * values. Replace the body with a real decoder to productionize. */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val window = math.max(1, payload.length / dim)
    Array.tabulate(dim) { j =>
      var s = 0
      var i = j * window
      while (i < math.min(payload.length, (j + 1) * window)) {
        s += payload(i) & 0xff
        i += 1
      }
      s.toFloat / (255f * window)
    }
  }

  /** Per-partition batched feature extraction — narrow (no shuffle).
    * Routes through [[decodeFeatures]]: BMP/WAV payloads take the real
    * decode path, anything else the stub. q36's oracle keeps mirroring
    * the stub exactly: [[syntheticMedia]]'s byte formula
    * ((id*31 + i*7) % 251) can never produce the 'BM' or 'RIFF' magic
    * in positions 0-1/0-3, so synthetic payloads always fall through. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // One decoder context per partition (where a real implementation
      // would load the codec/model once per task).
      rows.map(r => MediaFeatures(r.media_id, r.kind, dim,
        decodeFeatures(r.payload, dim)))
    }
  }

  /** STUB resize — stands in for decode → scale → re-encode (codec libs
    * absent): maps the payload to a `w*h`-byte "image" by averaging
    * contiguous byte windows (area interpolation on the opaque bytes).
    * Deterministic integer math, so tests can assert exact values;
    * swapping in a real scaler changes one function. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = w * h
    val window = math.max(1, payload.length / target)
    Array.tabulate(target) { j =>
      val from = j * window
      val until = math.min(payload.length, from + window)
      if (from >= payload.length) 0.toByte
      else {
        var s = 0
        var i = from
        while (i < until) { s += payload(i) & 0xff; i += 1 }
        (s / (until - from)).toByte
      }
    }
  }

  /** Re-encode decoded pixels as a 24-bit bottom-up BMP (the inverse of
    * [[decodeBmp]]) so real-path resizes stay round-trippable. */
  def encodeBmp(img: DecodedImage): Array[Byte] = {
    val rowStride = (img.width * 3 + 3) / 4 * 4
    val dataSize = rowStride * img.height
    val out = new Array[Byte](54 + dataSize)
    def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, 54 + dataSize); put32(10, 54); put32(14, 40)
    put32(18, img.width); put32(22, img.height)
    put16(26, 1); put16(28, 24)
    put32(34, dataSize); put32(38, 2835); put32(42, 2835)
    var y = 0
    while (y < img.height) {
      var o = 54 + (img.height - 1 - y) * rowStride // bottom-up
      var x = 0
      while (x < img.width) {
        val p = img.rgb(y * img.width + x)
        out(o) = (p & 0xff).toByte
        out(o + 1) = ((p >> 8) & 0xff).toByte
        out(o + 2) = ((p >> 16) & 0xff).toByte
        o += 3
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL resize for decodable BMPs: per-channel area average over the
    * source box each target pixel covers (integer math, deterministic),
    * re-encoded with [[encodeBmp]]. */
  def resizeBmp(img: DecodedImage, w: Int, h: Int): DecodedImage = {
    val rgb = new Array[Int](w * h)
    var ty = 0
    while (ty < h) {
      val y0 = ty * img.height / h
      val y1 = math.max(y0 + 1, (ty + 1) * img.height / h)
      var tx = 0
      while (tx < w) {
        val x0 = tx * img.width / w
        val x1 = math.max(x0 + 1, (tx + 1) * img.width / w)
        var (r, g, b, n) = (0, 0, 0, 0)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.rgb(y * img.width + x)
            r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
            n += 1
            x += 1
          }
          y += 1
        }
        rgb(ty * w + tx) = ((r / n) << 16) | ((g / n) << 8) | (b / n)
        tx += 1
      }
      ty += 1
    }
    DecodedImage(w, h, rgb)
  }

  /** Per-partition batched resize of image/video payloads (narrow, like
    * [[extractFeatures]]); audio rows pass through untouched. Metadata is
    * rewritten to the new dimensions. BMP payloads take the REAL
    * decode → area-average → re-encode path; other formats the stub. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.kind == "audio") r
        else {
          val resized = decodeBmp(r.payload) match {
            case Some(img) => encodeBmp(resizeBmp(img, w, h))
            case None      => resizeStub(r.payload, w, h)
          }
          r.copy(payload = resized, meta = r.meta.copy(width = w, height = h))
        }
      }
    }
  }

  /** Per-file decode summary row — the q57 oracle surface. */
  case class MediaSummary(name: String, kind: String, width: Long, height: Long,
                          sample_rate: Long, n_units: Long, value_sum: Long,
                          first_unit: Long)

  /** Decode every .bmp/.wav under `dir` (Spark's binaryFile source — the
    * real ingest path for media lakes: file-granular splits, no shuffle)
    * into exact per-file aggregates. Oracle-gated against aggregates an
    * independent generator computed from the source formulas, so this is
    * the end-to-end proof the REAL decoders parse container bytes
    * correctly: `first_unit` (top-left pixel / first sample) breaks on
    * row-order mistakes, `value_sum` on padding/channel/endian mistakes. */
  def decodeSummary(spark: SparkSession, dir: String): Dataset[MediaSummary] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{bmp,wav}")
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        decodeBmp(bytes) match {
          case Some(img) =>
            var sum = 0L
            img.rgb.foreach { p =>
              sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            }
            MediaSummary(name, "image", img.width, img.height, 0L,
              img.rgb.length, sum, img.rgb(0))
          case None => decodeWavPcm(bytes) match {
            case Some(au) =>
              var sum = 0L
              au.samples.foreach(sum += _)
              MediaSummary(name, "audio", 0L, 0L, au.sampleRate,
                au.samples.length, sum, au.samples(0))
            case None =>
              MediaSummary(name, "undecodable", 0L, 0L, 0L, 0L, 0L, 0L)
          }
        }
      }
  }

  /** 64-bit average perceptual hash (aHash) of a decoded image — the
    * image-side near-dup fingerprint (re-encodes, slight recompression
    * and small retouches keep most bits; unrelated images differ in
    * ~half). EXACT integer contract so the fixture generator can
    * compute expected hashes from its drawing formulas alone:
    * luma = r+g+b per pixel; 8×8 blocks with floor ranges
    * [⌊i·h/8⌋, ⌊(i+1)·h/8⌋); bit k (k = by·8+bx, MSB first) set iff
    * blockSum · totalPixels > totalSum · blockCount — cross-multiplied,
    * no fractional averages anywhere (safe in Long up to ~30-megapixel
    * frames). Degenerate dimensions (<8) leave empty blocks as 0 bits,
    * deterministically on both sides. */
  def aHash(img: DecodedImage): Long = {
    val w = img.width; val h = img.height
    val n = w.toLong * h
    var total = 0L
    val luma = new Array[Long](img.rgb.length)
    var i = 0
    while (i < img.rgb.length) {
      val p = img.rgb(i)
      val l = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      luma(i) = l; total += l; i += 1
    }
    var hash = 0L
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val y0 = by * h / 8; val y1 = (by + 1) * h / 8
        val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
        var bs = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { bs += luma(y * w + x); x += 1 }
          y += 1
        }
        val bc = (y1 - y0).toLong * (x1 - x0)
        if (bs * n > total * bc) hash |= 1L << (63 - (by * 8 + bx))
        bx += 1
      }
      by += 1
    }
    hash
  }

  /** 64-bit energy hash of decoded PCM audio — the audio-side analogue
    * of [[aHash]]: the interleaved sample stream splits into 64 floor
    * ranges, bit k (MSB first) set iff that window's absolute-amplitude
    * sum is strictly above the per-sample mean, cross-multiplied
    * (windowSum · nSamples > totalAbsSum · windowCount) so the fixture
    * generator reproduces the exact bits from its sample formulas.
    * Robust to small edits (a few samples moved keeps most window
    * energies on the same side of the mean); a different signal flips
    * ~half the bits. */
  def audioEnergyHash(au: DecodedAudio): Long = {
    val n = au.samples.length
    // cross-multiplication bound: total*wc <= (32768·n)·(n/64) = 512n²
    // must stay under 2^63 → n <= ~1.3e8 samples (a 2h+ 16 kHz mono
    // file). Fail loudly rather than wrap into silently wrong bits;
    // aHash documents its ~30-megapixel analogue of this bound.
    require(n <= 130000000,
      s"audioEnergyHash: $n samples exceeds the exact-arithmetic bound " +
        "(~1.3e8); chunk the audio or pool first")
    var total = 0L
    var i = 0
    while (i < n) { total += math.abs(au.samples(i).toInt); i += 1 }
    var hash = 0L
    var k = 0
    while (k < 64) {
      val lo = k * n / 64; val hi = (k + 1) * n / 64
      var ws = 0L
      var j = lo
      while (j < hi) { ws += math.abs(au.samples(j).toInt); j += 1 }
      val wc = (hi - lo).toLong
      if (ws * n > total * wc) hash |= 1L << (63 - k)
      k += 1
    }
    hash
  }

  /** `(name, ahash)` for every decodable WAV under `dir`. */
  def audioHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        decodeWavPcm(bytes).map(au =>
          (path.substring(path.lastIndexOf('/') + 1), audioEnergyHash(au)))
      }
      .toDF("name", "ahash")
  }

  /** `(name, ahash)` for every decodable BMP under `dir` (binaryFile
    * source — file-granular splits, no shuffle, the media-lake scan). */
  def imageHashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bmp")
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        decodeBmp(bytes).map(img =>
          (path.substring(path.lastIndexOf('/') + 1), aHash(img)))
      }
      .toDF("name", "ahash")
  }

  /** Near-duplicate pairs by 64-bit fingerprint hamming distance
    * (image aHash, audio energy hash — any (name, ahash) frame),
    * via the pigeonhole segment join (SimHash precedent): the 64 bits
    * split into maxHamming+1 contiguous segments — any pair within the
    * threshold agrees on at least one whole segment, so candidates come
    * from an EQUI-join on (segment index, segment value), never an
    * all-pairs scan; exact xor-popcount verifies. Complete for
    * hamming <= maxHamming. */
  def nearDupHashPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31, s"bad threshold: $maxHamming")
    val nSeg = maxHamming + 1
    val segs = (0 until nSeg).map { i =>
      val lo = i * 64 / nSeg; val hi = (i + 1) * 64 / nSeg
      val width = hi - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1
      struct(lit(i).as("seg"),
        shiftrightunsigned(col("ahash"), lo).bitwiseAND(mask).as("v"))
    }
    val exploded = hashes
      .select(col("name"), col("ahash"), explode(array(segs: _*)).as("s"))
      .select(col("name"), col("ahash"), col("s.seg").as("seg"),
        col("s.v").as("v"))
    val l = exploded.toDF("name_a", "ahash_a", "seg", "v")
    val r = exploded.toDF("name_b", "ahash_b", "seg", "v")
    l.join(r, Seq("seg", "v"))
      .where(col("name_a") < col("name_b"))
      .select("name_a", "name_b", "ahash_a", "ahash_b").distinct()
      .withColumn("hamming",
        call_function("bit_count",
          col("ahash_a").bitwiseXOR(col("ahash_b"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("name_a", "name_b", "hamming")
  }

  /** `(media_id, frame_idx, fhash)` for video rows: each sampled frame
    * (fixed-size byte window, [[sampleFrames]]) fingerprinted with the
    * engine's rolling-hash formula over UNSIGNED byte values
    * (h = fold(h·31 + (b & 0xff)) mod 2^31−1). Narrow projection — no
    * shuffle; the fingerprint is a pure function of the payload bytes,
    * so the q110 oracle reproduces it from the synthetic byte formula. */
  def frameHashes(media: Dataset[MediaRow], frameBytes: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    sampleFrames(media.filter(col("kind") === "video").as[MediaRow],
        frameBytes)
      .map { fr =>
        var h = 0L
        var i = 0
        while (i < fr.frame.length) {
          h = (h * 31 + (fr.frame(i) & 0xff)) % 2147483647L
          i += 1
        }
        (fr.media_id, fr.frame_idx, h)
      }
      .toDF("media_id", "frame_idx", "fhash")
  }

  /** Video pairs sharing at least `minShared` sampled-frame
    * fingerprints — the container-level video near-dup check (re-muxed
    * or re-uploaded copies keep frame bytes; different content shares
    * nothing). Equi-join on the frame hash, never all-pairs; frames
    * seen in more than `maxDf` videos (intros, black frames) are
    * dropped BEFORE the join so no hot fingerprint fans out
    * quadratically (the winnowing df-cap precedent). */
  def sharedFrameVideoPairs(frames: DataFrame, minShared: Int,
                            maxDf: Int = 50): DataFrame = {
    require(minShared >= 1 && maxDf >= 2, s"bad bounds: $minShared/$maxDf")
    val dfreq = frames.groupBy(col("fhash"))
      .agg(countDistinct(col("media_id")).as("_df"))
      .where(col("_df") <= maxDf)
    val kept = frames.join(dfreq.select("fhash"), "fhash")
      .select(col("media_id"), col("frame_idx"), col("fhash")).distinct()
    val l = kept.toDF("media_a", "fi_a", "fhash")
    val r = kept.toDF("media_b", "fi_b", "fhash")
    l.join(r, Seq("fhash"))
      .where(col("media_a") < col("media_b") && col("fi_a") === col("fi_b"))
      .groupBy(col("media_a"), col("media_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Frame sampling for video payloads: fixed-size byte windows stand in
    * for decoded frames; non-video rows pass through with one frame. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      if (r.kind == "video")
        r.payload.grouped(frameBytes).zipWithIndex.map { case (b, i) =>
          FrameRow(r.media_id, i, b)
        }
      else Iterator(FrameRow(r.media_id, 0, r.payload))
    }
  }

  /** Partitioned parquet layout for media tables: kind-partitioned so
    * scans for one modality prune the rest. */
  def writePartitioned(media: Dataset[MediaRow], path: String): Unit =
    media.write.mode("overwrite").partitionBy("kind").parquet(path)
}
