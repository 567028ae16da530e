package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = Multimodal.syntheticMedia(spark, 30)

  test("media schema: opaque binary payload + typed metadata") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
    assert(media.count() == 30)
  }

  test("feature extraction is deterministic and dimension-correct") {
    val f1 = Multimodal.extractFeatures(media, dim = 16)
      .orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media, dim = 16)
      .orderBy("media_id").collect()
    assert(f1.length == 30)
    assert(f1.forall(_.features.length == 16))
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.features.toSeq == b.features.toSeq)
    }
    assert(f1.forall(_.features.forall(v => v >= 0f && v <= 1f)))
  }

  test("feature extraction is a narrow transformation (no shuffle)") {
    val plan = Multimodal.extractFeatures(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("resize produces w*h bytes for image/video, passes audio through") {
    val out = Multimodal.resize(media, 8, 8).collect()
    out.foreach { r =>
      if (r.kind == "audio") {
        assert(r.payload.length == 256 && r.meta.sampleRate == 16000)
      } else {
        assert(r.payload.length == 64)
        assert(r.meta.width == 8 && r.meta.height == 8)
      }
    }
    // deterministic: first resized byte of media 0 is the mean of the
    // first 4 payload bytes ((0*31 + i*7) % 251 for i=0..3 -> 0,7,14,21)
    val m0 = out.find(r => r.media_id == 0 && r.kind == "image").get
    assert((m0.payload(0) & 0xff) == (0 + 7 + 14 + 21) / 4)
  }

  test("resize is a narrow transformation (no shuffle)") {
    val plan = Multimodal.resize(media, 8, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("frame sampling explodes video payloads only") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64)
    val byKind = frames.toDF()
      .join(media.select(col("media_id"), col("kind")), "media_id")
      .groupBy("kind").agg(countDistinct("media_id").as("n"),
        count(lit(1)).as("rows"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byKind("video")._2 == byKind("video")._1 * 4) // 256/64 frames
    assert(byKind("image")._2 == byKind("image")._1)     // pass-through
  }

  // --- real decoders (BMP 24-bit / WAV PCM16) against known bytes ---

  test("decodeBmp: bottom-up rows, BGR order, 4-byte row padding") {
    // 2x2, 24-bit, row stride 8 (2 padding bytes); storage is bottom-up,
    // so the FIRST stored row is the BOTTOM image row.
    val header = Array[Byte]('B', 'M') ++
      le32(54 + 16) ++ le32(0) ++ le32(54) ++ // file size, reserved, offset
      le32(40) ++ le32(2) ++ le32(2) ++       // header size, w, h
      le16(1) ++ le16(24) ++ le32(0) ++ le32(16) ++
      le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
    val bottomRow = Array[Byte](30, 20, 10, 60, 50, 40, 0, 0) // BGR BGR pad
    val topRow = Array[Byte](90, 80, 70, 120, 110, 100, 0, 0)
    val img = Multimodal.decodeBmp(header ++ bottomRow ++ topRow).get
    assert(img.width == 2 && img.height == 2)
    // row-major from top-left: (r,g,b) = (70,80,90) first
    assert(img.rgb.toSeq == Seq(
      (70 << 16) | (80 << 8) | 90, (100 << 16) | (110 << 8) | 120,
      (10 << 16) | (20 << 8) | 30, (40 << 16) | (50 << 8) | 60))
    assert(Multimodal.decodeBmp("notabmp".getBytes).isEmpty)
  }

  test("decodeBmp: top-down storage (negative height) reads in file order") {
    val h2neg = Array[Byte](-2, -1, -1, -1) // height = -2, little-endian
    val header = Array[Byte]('B', 'M') ++
      le32(54 + 16) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ h2neg ++
      le16(1) ++ le16(24) ++ le32(0) ++ le32(16) ++
      le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
    val firstRow = Array[Byte](30, 20, 10, 60, 50, 40, 0, 0) // = TOP row here
    val secondRow = Array[Byte](90, 80, 70, 120, 110, 100, 0, 0)
    val img = Multimodal.decodeBmp(header ++ firstRow ++ secondRow).get
    assert(img.height == 2)
    assert(img.rgb.head == ((10 << 16) | (20 << 8) | 30)) // stored order kept
    assert(img.rgb.last == ((100 << 16) | (110 << 8) | 120))
  }

  test("malformed headers decode to None, never throw") {
    // BMP with a width whose int row stride would overflow negative
    val evil = Array[Byte]('B', 'M') ++ le32(70) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(0x30000000) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(16) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      new Array[Byte](16)
    assert(Multimodal.decodeBmp(evil).isEmpty)
    // WAV with a chunk size near Int.MaxValue (int bound check would
    // overflow and pass)
    val evilWav = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "data".getBytes ++ le32(Int.MaxValue - 4) ++ new Array[Byte](8)
    assert(Multimodal.decodeWavPcm(evilWav).isEmpty)
  }

  test("decodeWavPcm: odd-size junk chunk is word-aligned past correctly") {
    val samples = Seq[Short](5, -5)
    val data = samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val fmt = le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val junk = "LIST".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // 3 + pad
    val wav = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      junk ++
      "fmt ".getBytes ++ le32(16) ++ fmt ++
      "data".getBytes ++ le32(data.length) ++ data
    val au = Multimodal.decodeWavPcm(wav).get
    assert(au.sampleRate == 8000 && au.samples.toSeq == samples)
  }

  test("decodeWavPcm: zero-size data chunk is undecodable, not an empty array") {
    // A structurally valid PCM-16 WAV whose data chunk has size 0 must
    // decode to None: an empty samples array would crash every consumer
    // that reads samples(0) (decodeSummary's first_unit, energy hash).
    val fmt = le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val wav = "RIFF".getBytes ++ le32(4 + 8 + 16 + 8) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ fmt ++
      "data".getBytes ++ le32(0)
    assert(Multimodal.decodeWavPcm(wav).isEmpty)
  }

  test("decodeWavPcm: chunk walk, little-endian int16, stereo interleave") {
    val samples = Seq[Short](-1, 2, -300, 400)
    val data = samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val fmt = le16(1) ++ le16(2) ++ le32(44100) ++ le32(44100 * 4) ++
      le16(4) ++ le16(16)
    val wav = "RIFF".getBytes ++ le32(4 + 8 + 16 + 8 + data.length) ++
      "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ fmt ++
      "data".getBytes ++ le32(data.length) ++ data
    val au = Multimodal.decodeWavPcm(wav).get
    assert(au.sampleRate == 44100 && au.channels == 2)
    assert(au.samples.toSeq == samples)
    assert(Multimodal.decodeWavPcm("RIFFxxxxJUNK".getBytes).isEmpty)
  }

  test("checked-in fixtures decode to the generator's exact aggregates") {
    val rows = Multimodal.decodeSummary(spark, "/root/repo/fixtures/media")
      .collect().map(r => r.name -> r).toMap
    assert(rows.size == 10 && !rows.values.exists(_.kind == "undecodable"))
    val grad = rows("img_gradient.bmp")
    assert(grad.width == 7 && grad.height == 5 && grad.value_sum == 5285 &&
      grad.first_unit == 330499)
    val tone = rows("img_twotone.bmp")
    assert(tone.first_unit == ((200 << 16) | (40 << 8) | 90)) // TOP-left
    val ramp = rows("audio_ramp.wav")
    assert(ramp.sample_rate == 8000 && ramp.n_units == 1000 &&
      ramp.value_sum == -3748 && ramp.first_unit == -1024)
    val st = rows("audio_stereo.wav")
    assert(st.n_units == 1000 && st.value_sum == -4472)
  }

  test("real BMP resize: area average, re-encoded payload round-trips") {
    val px = Array.tabulate(16) { i => // 4x4 gradient, r = 16*i
      ((i * 16) << 16) | (7 << 8) | 9
    }
    val payload = Multimodal.encodeBmp(Multimodal.DecodedImage(4, 4, px))
    val back = Multimodal.decodeBmp(payload).get
    assert(back.rgb.toSeq == px.toSeq) // encode/decode round-trip
    val half = Multimodal.resizeBmp(back, 2, 2)
    // each 2x2 box's r-mean: ((0+16)+(64+80))/4 etc.
    val exp = Seq((0, 1, 4, 5), (2, 3, 6, 7), (8, 9, 12, 13), (10, 11, 14, 15))
      .map { case (a, b, c, d) => (a + b + c + d) * 16 / 4 }
    assert(half.rgb.toSeq.map(p => (p >> 16) & 0xff) == exp)
    assert(half.rgb.forall(p => ((p >> 8) & 0xff) == 7 && (p & 0xff) == 9))
    // and the Dataset-level resize takes the real path for BMP payloads
    val ds = spark.createDataset(Seq(Multimodal.MediaRow(99L, "image", payload,
      Multimodal.MediaMeta(4, 4, 0, 0L, "bmp"))))
    val out = Multimodal.resize(ds, 2, 2).collect().head
    assert(Multimodal.decodeBmp(out.payload).get.rgb.toSeq == half.rgb.toSeq)
  }

  test("feature extraction routes real formats through the real decoder") {
    val px = Array.fill(4)((255 << 16) | (255 << 8) | 255) // 2x2 white
    val bmp = Multimodal.encodeBmp(Multimodal.DecodedImage(2, 2, px))
    val f = Multimodal.decodeFeatures(bmp, 1)
    assert(f.toSeq == Seq(1f)) // white = max grayscale, not a byte-sum hash
  }

  private def le16(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  test("kind-partitioned write prunes other modalities on scan") {
    val tmp = Files.createTempDirectory("media").toString
    Multimodal.writePartitioned(media, tmp)
    val imgs = spark.read.parquet(tmp).filter(col("kind") === "image")
    assert(imgs.count() == 10)
    val scan = imgs.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || imgs.inputFiles.forall(_.contains("kind=image")))
  }

  test("aHash: hand-computed bit patterns") {
    // 8x8, left half dark / right half bright: 1x1 blocks, bits set on
    // the right half of each row -> 0x0F repeated per row byte
    val lr = Array.tabulate(64) { i =>
      if (i % 8 < 4) 0x000000 else 0xffffff
    }
    assert(Multimodal.aHash(Multimodal.DecodedImage(8, 8, lr)) ==
      0x0f0f0f0f0f0f0f0fL)
    // uniform image: no block is STRICTLY above the mean -> all zero
    val flat = Array.fill(64)(0x123456)
    assert(Multimodal.aHash(Multimodal.DecodedImage(8, 8, flat)) == 0L)
    // top half bright -> first 4 row bytes set
    val tb = Array.tabulate(64)(i => if (i < 32) 0xffffff else 0x000000)
    assert(Multimodal.aHash(Multimodal.DecodedImage(8, 8, tb)) ==
      0xffffffff00000000L)
  }

  test("aHash survives the encode/resize path and flags the near-dup pair") {
    val out = Multimodal.nearDupHashPairs(
      Multimodal.imageHashes(spark, "/root/repo/fixtures/media"),
      maxHamming = 7)
    val pairs = out.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs == Set(("img_g16.bmp", "img_g16_tweak.bmp", 2L)),
      s"got $pairs")
  }

  test("audio energy hash flags the silence-edited near-duplicate only") {
    val out = Multimodal.nearDupHashPairs(
      Multimodal.audioHashes(spark, "/root/repo/fixtures/media"),
      maxHamming = 7)
    val pairs = out.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs == Set(("audio_ramp.wav", "audio_ramp_tweak.wav", 7L)),
      s"got $pairs")
  }

  test("audio energy hash: uniform signal hashes to zero") {
    val au = Multimodal.DecodedAudio(8000, 1, Array.fill(640)(100.toShort))
    assert(Multimodal.audioEnergyHash(au) == 0L)
    // first half loud, second silent: top 32 bits set
    val half = Multimodal.DecodedAudio(8000, 1,
      Array.tabulate(640)(i => if (i < 320) 1000.toShort else 0.toShort))
    assert(Multimodal.audioEnergyHash(half) == 0xffffffff00000000L)
  }
}
