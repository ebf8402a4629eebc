package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Multimodal
import graft.sources.Multimodal.Asset

/** Multimodal binary columns (SURVEY.md §2.9 "multimodal columns"): the
  * storage schema round-trips parquet byte-exactly, and the (stubbed-codec)
  * feature extraction is deterministic and partitioning-independent — the
  * properties the real decoder plumbing must keep. */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("binary payload + metadata round-trips parquet byte-exactly") {
    val assets = Multimodal.syntheticAssets(spark, 50)
    val tmp = Files.createTempDirectory("graft_mm").toString
    assets.write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp).as[Asset].collect().sortBy(_.asset_id)
    val orig = assets.collect().sortBy(_.asset_id)
    assert(back.length === orig.length)
    back.zip(orig).foreach { case (b, o) =>
      assert(b.kind === o.kind && b.width === o.width &&
             b.sample_rate === o.sample_rate && b.format === o.format)
      assert(java.util.Arrays.equals(b.payload, o.payload),
        s"payload bytes differ for asset ${o.asset_id}")
    }
  }

  test("feature extraction is deterministic and partition-count independent") {
    val f1 = Multimodal.extractFeatures(Multimodal.syntheticAssets(spark, 50))
      .collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(
        Multimodal.syntheticAssets(spark, 50).repartition(7))
      .collect().sortBy(_.asset_id)
    assert(f1.length === 50 && f2.length === 50)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.checksum === b.checksum)
      assert(a.features.toSeq === b.features.toSeq)
      assert(a.features.length === 8)
      assert(a.features.forall(f => f >= 0f && f <= 1f))
    }
  }

  test("feature frame keeps modality co-location and join key") {
    val df = Multimodal.featureFrame(Multimodal.syntheticAssets(spark, 30))
    assert(df.columns.toSet === Set("asset_id", "kind", "n_bytes", "checksum", "features"))
    assert(df.count() === 30)
    assert(df.select("kind").distinct().count() === 3)
  }

  test("frame sampling REALLY demuxes AVI videos into every k-th verbatim JPEG chunk; non-AVI payloads keep the byte-slice fallback") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    val frames = Multimodal.sampleFrames(assets, everyK = 2).collect()
    val videos = assets.collect().filter(_.kind == "video")
    assert(videos.nonEmpty && frames.nonEmpty)
    val byAsset = frames.groupBy(_.asset_id)
    assert(byAsset.keySet === videos.map(_.asset_id).toSet,
      "every video (and only videos) should yield frames")
    videos.foreach { v =>
      val chunks = Multimodal.demuxAvi(v.payload).get
      assert(chunks.length === 17, "synthetic clips carry 17 frames")
      val expected = (0 until chunks.length by 2).toSeq
      val got = byAsset(v.asset_id).map(_.frame_idx).toSeq.sorted
      assert(got === expected, s"asset ${v.asset_id}: frame indices $got != $expected")
      byAsset(v.asset_id).foreach { f =>
        assert(java.util.Arrays.equals(f.frame_bytes, chunks(f.frame_idx)),
          "sampled frame bytes must be the container's JPEG chunk, verbatim")
        assert((f.frame_bytes(0) & 0xff) === 0xff && (f.frame_bytes(1) & 0xff) === 0xd8,
          "each sampled frame must be a plain JPEG (SOI marker)")
      }
    }
    // a video payload OUTSIDE the container subset keeps the declared stub
    val raw = Array.tabulate[Byte](64)(j => (j * 7).toByte)
    val fall = Multimodal.sampleFrames(
      Seq(Multimodal.Asset(99L, "video", raw, 0, 0, 0, "raw")).toDS(),
      frameSize = 16, everyK = 2).collect()
    assert(fall.map(_.frame_idx).toSeq.sorted === Seq(0, 2))
    fall.foreach(f => assert(f.frame_bytes.toSeq ===
      raw.slice(f.frame_idx * 16, f.frame_idx * 16 + 16).toSeq))
  }

  test("resize REALLY rescales decodable payloads in place, keeping keys; others keep the stub") {
    val assets = Multimodal.syntheticAssets(spark, 20)
    val orig = assets.collect().sortBy(_.asset_id)
    val resized = Multimodal.resize(assets, 32, 24).collect().sortBy(_.asset_id)
    assert(resized.length === orig.length)
    resized.zip(orig).foreach { case (r, o) =>
      assert(r.asset_id === o.asset_id && r.kind === o.kind)
      assert(r.width === 32 && r.height === 24)
      assert(r.payload.nonEmpty)
      r.kind match {
        case "image" =>
          // REAL: the payload is a PNG whose decoded raster IS the target size
          val img = Multimodal.decodeImage(r.payload).get
          assert(img.getWidth === 32 && img.getHeight === 24)
        case "video" =>
          // REAL: every demuxed frame rescaled, frame count preserved
          val frames = Multimodal.decodeAviFrames(r.payload).get
          assert(frames.length ===
            Multimodal.decodeAviFrames(o.payload).get.length)
          frames.foreach(f => assert(f.getWidth === 32 && f.getHeight === 24))
        case _ =>
          // audio has no raster to scale: the declared byte-stride stub
          assert(r.payload.length <= o.payload.length)
      }
    }
    // deterministic across runs (software rasterizer + deterministic encoders)
    val again = Multimodal.resize(Multimodal.syntheticAssets(spark, 20), 32, 24)
      .collect().sortBy(_.asset_id)
    resized.zip(again).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.payload, b.payload))
    }
  }

  test("PNG decode is REAL: crafted pixels yield exact channel means, dims, and a raster checksum") {
    // 2×1 image: one pure-red pixel, one pure-blue pixel — every expected
    // stat is computable by hand from the decoded raster
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    img.setRGB(1, 0, 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val (checksum, f) = Multimodal.decodePng(png).get
    assert(f(0) === 2 / 1024f && f(1) === 1 / 1024f, "dims from the decoded raster")
    assert(f(2) === 0.5f, "meanR: one full-red pixel of two")
    assert(f(3) === 0f, "meanG: no green anywhere")
    assert(f(4) === 0.5f, "meanB: one full-blue pixel of two")
    assert(math.abs(f(5) - (0.299f + 0.114f) / 2) < 1e-4, "mean luma")
    assert(math.abs(f(6) - (0.299f - 0.114f) / 2) < 1e-4, "luma std")
    assert(checksum === 0xff0000L * 131 + 0xffL,
      "checksum is the polynomial hash over DECODED pixels, not payload bytes")

    // the same payload through the pipeline (binary column -> mapPartitions)
    // carries the real decode; a non-image asset with identical bytes takes
    // the stub path — the dispatch is on the typed metadata
    val viaPipeline = Multimodal.extractFeatures(
      Seq(Multimodal.Asset(1L, "image", png, 2, 1, 0, "png")).toDS()).collect().head
    assert(viaPipeline.checksum === checksum)
    assert(viaPipeline.features.toSeq === f.toSeq)
    val asAudio = Multimodal.extractFeatures(
      Seq(Multimodal.Asset(2L, "audio", png, 2, 1, 16000, "raw")).toDS()).collect().head
    assert(asAudio.checksum === Multimodal.decodeStub(png)._1,
      "non-image kinds must keep the declared stub path")
    // a corrupt 'png' payload falls back to the stub instead of failing the task
    val junk = Array.tabulate[Byte](32)(_.toByte)
    val corrupt = Multimodal.extractFeatures(
      Seq(Multimodal.Asset(3L, "image", junk, 2, 1, 0, "png")).toDS()).collect().head
    assert(corrupt.checksum === Multimodal.decodeStub(junk)._1)
  }

  test("WAV decode is REAL: a pure sine yields its textbook RMS, zero-crossing rate, and peak") {
    // 1 s of 440 Hz at amplitude 12000/32768 over 8 kHz mono 16-bit PCM:
    // every expected stat is signal-processing arithmetic, not payload-byte
    // arithmetic — only a genuine decode of the PCM samples can produce it
    val sr = 8000
    val amp = 12000
    val samples = Array.tabulate(sr)(i =>
      math.round(amp * math.sin(2 * math.Pi * 440 * i / sr)).toInt)
    val wav = Multimodal.encodeWav(samples, sr)
    val (checksum, f) = Multimodal.decodeWav(wav).get
    assert(f(0) === 1.0f, "duration: 8000 frames at 8 kHz is one second")
    assert(math.abs(f(1) - amp / 32768f / math.sqrt(2).toFloat) < 1e-3,
      s"sine RMS must be amplitude/sqrt(2), got ${f(1)}")
    assert(math.abs(f(2) - 2 * 440f / sr) < 1e-3,
      s"a 440 Hz tone crosses zero 880 times per second, got ${f(2)}")
    assert(math.abs(f(3) - amp / 32768f) < 1e-3, "peak is the sine amplitude")
    assert(f(4) === 1f && f(5) === sr / 48000f, "channels and rate from the header")
    assert(math.abs(f(6)) < 1e-3, "a pure sine has no DC offset")
    // container invariance: the checksum hashes DECODED samples, so a
    // GENUINELY different container over the same PCM (trailing JUNK
    // chunk, patched RIFF length — different bytes) changes nothing
    val rewrapped = Multimodal.withTrailingJunkChunk(wav)
    assert(!java.util.Arrays.equals(rewrapped, wav),
      "the re-containered payload must actually differ in bytes")
    assert(Multimodal.decodeWav(rewrapped).get._1 === checksum)

    // pipeline dispatch: audio+wav takes the real decode; audio+raw and a
    // corrupt wav payload keep the stub fallback
    val viaPipeline = Multimodal.extractFeatures(
      Seq(Multimodal.Asset(1L, "audio", wav, 0, 0, sr, "wav")).toDS()).collect().head
    assert(viaPipeline.checksum === checksum)
    assert(viaPipeline.features.toSeq === f.toSeq)
    val junk = Array.tabulate[Byte](48)(j => (j * 11).toByte)
    val corrupt = Multimodal.extractFeatures(
      Seq(Multimodal.Asset(2L, "audio", junk, 0, 0, sr, "wav")).toDS()).collect().head
    assert(corrupt.checksum === Multimodal.decodeStub(junk)._1,
      "an unparsable wav payload must fall back to the stub, not fail the task")
  }

  test("synthetic audio assets are genuine WAVs; metadata sample_rate matches the decoded header") {
    val audio = Multimodal.syntheticAssets(spark, 30).collect()
      .filter(_.kind == "audio")
    assert(audio.nonEmpty)
    audio.foreach { a =>
      assert(a.format === "wav")
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(a.payload))
      try assert(in.getFormat.getSampleRate.toInt === a.sample_rate,
        s"asset ${a.asset_id}: metadata rate must be the true encoded rate")
      finally in.close()
      assert(Multimodal.decodeWav(a.payload).isDefined,
        s"asset ${a.asset_id} must decode through the real path")
    }
  }

  test("synthetic image assets are genuine PNGs; metadata dims match the decoded raster") {
    val imgs = Multimodal.syntheticAssets(spark, 30).collect().filter(_.kind == "image")
    assert(imgs.nonEmpty)
    imgs.foreach { a =>
      val decoded = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(a.payload))
      assert(decoded != null, s"asset ${a.asset_id} payload is not a decodable PNG")
      assert(decoded.getWidth === a.width && decoded.getHeight === a.height,
        s"asset ${a.asset_id}: metadata dims must be the true encoded dims")
    }
  }

  test("declared q_multimodal_features: 300 scalar rows, deterministic, all kinds") {
    val rows = Multimodal.qMultimodalFeatures(spark, TestSpark.sfDir).collect()
    assert(rows.length === 300)
    assert(rows.map(_.getLong(0)).toSeq === (0L until 300L).toSeq)
    assert(rows.map(_.getString(1)).toSet === Set("image", "audio", "video"))
    rows.foreach { r =>
      assert(r.getString(4).split(",").length === 8, "8-dim feature vector flattened")
    }
    val again = Multimodal.qMultimodalFeatures(spark, TestSpark.sfDir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("image dedup: every planted variant pair is recovered; unrelated cards never pair") {
    val nBase = 200
    val pairs = Multimodal.imageDedupPairs(
        Multimodal.syntheticImageCorpus(spark, nBase, everyK = 5))
      .collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"),
        r.getAs[Int]("hamming")))
    // planted truth: base i (i % 5 == 0) has a re-encoded twin at i + nBase,
    // a brightness-shifted twin at i + 2·nBase and a block-edited twin at
    // i + 3·nBase; all four are mutual near-dups (the edit moves at most
    // 3 fingerprint bits) — one component of 4 → 6 pairs per planted base
    val planted = (0 until nBase by 5).flatMap { i =>
      val ids = Seq(i.toLong, i + nBase.toLong, i + 2L * nBase, i + 3L * nBase)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(planted.subsetOf(found),
      s"missed planted near-dup pairs: ${(planted -- found).toSeq.sorted.take(5)}")
    assert(found === planted,
      s"unrelated cards must never pair at Hamming <= 3: extras = ${(found -- planted).toSeq.sorted.take(5)}")
    // re-encodes are raster-identical (Hamming 0); the +6 shift never
    // clamps on the block cards, so its fingerprint is also exact — the
    // block-edited twin (ids >= 3·nBase) is the deliberate non-zero case
    assert(pairs.filter(_._2 < 3L * nBase).forall(_._3 === 0),
      s"re-encode and shift variants must be fingerprint-exact on the clamp-free cards")
  }

  test("image dedup: planted block edits land at measured Hamming 1-3 and are recovered through the banded join's tolerance band") {
    val nBase = 200
    val corpus = Multimodal.syntheticImageCorpus(spark, nBase, everyK = 5)
    // reassemble each 64-bit fingerprint from its four 16-bit bands
    val fp = Multimodal.imageFingerprints(corpus).collect().map { r =>
      r.getLong(0) -> ((r.getInt(1).toLong & 0xffffL) |
        ((r.getInt(2).toLong & 0xffffL) << 16) |
        ((r.getInt(3).toLong & 0xffffL) << 32) |
        ((r.getInt(4).toLong & 0xffffL) << 48))
    }.toMap
    val planted = (0 until nBase by 5).map { i =>
      (i.toLong, i + 3L * nBase,
        java.lang.Long.bitCount(fp(i.toLong) ^ fp(i + 3L * nBase)))
    }
    // the block edit pins bits 35/36/37 to (0,0,1): never more than 3 flips,
    // and ≥ 1 for every base whose prior bits weren't already (0,0,1)
    assert(planted.forall(_._3 <= 3),
      s"a single-block edit must move at most 3 fingerprint bits, got ${planted.filter(_._3 > 3)}")
    val band = planted.filter(p => p._3 >= 1 && p._3 <= 3)
    assert(band.size >= 10,
      s"expected a healthy population of measured Hamming 1-3 planted pairs, got ${band.size} of ${planted.size}")
    // every measured-distance pair must come back from the banded join WITH
    // that distance — this is the tolerance band the join exists for, which
    // the Hamming-0 recall case alone never exercised
    val pairs = Multimodal.imageDedupPairs(corpus).collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b")) ->
        r.getAs[Int]("hamming")).toMap
    for ((a, b, d) <- band)
      assert(pairs.get((a, b)).contains(d),
        s"planted Hamming-$d pair ($a,$b) not recovered, got ${pairs.get((a, b))}")
  }

  test("audio dedup: every planted variant pair is recovered; unrelated clips never pair") {
    val nBase = 200
    val pairs = Multimodal.audioDedupPairs(
        Multimodal.syntheticAudioCorpus(spark, nBase, everyK = 5))
      .collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"),
        r.getAs[Int]("hamming")))
    // planted truth: base i (i % 5 == 0) has a re-containered twin at
    // i + nBase, a volume-scaled twin at i + 2·nBase and a tone-burst twin
    // at i + 3·nBase; all four are mutual near-dups — 6 pairs per base
    val planted = (0 until nBase by 5).flatMap { i =>
      val ids = Seq(i.toLong, i + nBase.toLong, i + 2L * nBase, i + 3L * nBase)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(planted.subsetOf(found),
      s"missed planted near-dup pairs: ${(planted -- found).toSeq.sorted.take(5)}")
    assert(found === planted,
      s"unrelated clips must never pair at Hamming <= 3: extras = ${(found -- planted).toSeq.sorted.take(5)}")
    // re-containers are sample-identical and the ×1.2 volume scale is
    // clip-free by construction — both fingerprint-exact; the tone-burst
    // twin (ids >= 3·nBase) is the deliberate non-zero case
    assert(pairs.filter(_._2 < 3L * nBase).forall(_._3 === 0),
      "re-container and volume variants must be fingerprint-exact")
    val burst = pairs.filter(p => p._1 < nBase && p._2 >= 3L * nBase)
    assert(burst.forall(p => p._3 >= 0 && p._3 <= 3))
    assert(burst.exists(_._3 >= 1),
      s"the tone burst must flip at least one high-band gradient bit " +
        s"somewhere in the corpus (else the tolerance band is untested), " +
        s"got hammings ${burst.map(_._3).distinct.sorted.toSeq}")
  }

  test("AVI demux+decode is REAL: crafted JPEG frames round-trip verbatim; the checksum hashes DECODED rasters, container-invariantly") {
    // two hand-built frames through the one JPEG encoder and the one AVI
    // encoder; the demuxer must hand back the exact chunk bytes, and the
    // video checksum must equal the polynomial hash over the DECODED
    // rasters (computable independently via decodeImage) — only a genuine
    // demux + JPEG decode can produce both
    val frames = (0 until 2).map { k =>
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, ((x * 15 + k * 40) << 16) | ((y * 15) << 8) | 128)
      Multimodal.encodeJpeg(img)
    }
    val avi = Multimodal.encodeAvi(frames, 16, 16, fps = 10)
    val chunks = Multimodal.demuxAvi(avi).get
    assert(chunks.length === 2)
    chunks.zip(frames).foreach { case (c, f) =>
      assert(java.util.Arrays.equals(c, f), "demux must be verbatim, no transcode")
    }
    val decoded = Multimodal.decodeAviFrames(avi).get
    assert(decoded.forall(im => im.getWidth === 16 && im.getHeight === 16))
    // independent checksum over the decoded rasters
    var expect = 0L
    decoded.foreach { im =>
      for (y <- 0 until 16; x <- 0 until 16)
        expect = expect * 131 + (im.getRGB(x, y) & 0xffffff)
    }
    val (checksum, feats) = Multimodal.decodeAviVideo(avi).get
    assert(checksum === expect,
      "checksum must hash DECODED pixels, not payload bytes")
    assert(feats.length === 8 && feats.forall(f => f >= 0f && f <= 1f))
    // container invariance: a genuinely different container (trailing JUNK
    // chunk, patched RIFF length) over the same frame chunks decodes equal
    val rewrapped = Multimodal.withTrailingJunkAvi(avi)
    assert(!java.util.Arrays.equals(rewrapped, avi))
    assert(Multimodal.decodeAviVideo(rewrapped).get._1 === checksum)
    // pipeline dispatch: video+avi takes the real decode; video+raw and a
    // corrupt avi payload keep the stub fallback
    val viaPipeline = Multimodal.extractFeatures(
      Seq(Multimodal.Asset(1L, "video", avi, 16, 16, 0, "avi")).toDS()).collect().head
    assert(viaPipeline.checksum === checksum)
    assert(viaPipeline.features.toSeq === feats.toSeq)
    val junk = Array.tabulate[Byte](40)(j => (j * 13).toByte)
    assert(Multimodal.demuxAvi(junk).isEmpty)
    val corrupt = Multimodal.extractFeatures(
      Seq(Multimodal.Asset(2L, "video", junk, 0, 0, 0, "avi")).toDS()).collect().head
    assert(corrupt.checksum === Multimodal.decodeStub(junk)._1,
      "an unparsable avi payload must fall back to the stub, not fail the task")
    // a torn frame chunk (valid container, undecodable JPEG) also falls back
    val torn = Multimodal.encodeAvi(Seq(frames.head.take(8)), 16, 16, 10)
    assert(Multimodal.demuxAvi(torn).isDefined && Multimodal.decodeAviFrames(torn).isEmpty)
    // the container carries a STANDARD idx1 index: one 16-byte keyframe
    // entry per frame whose offset (relative to the movi fourcc) lands
    // exactly on that frame's 00dc chunk header — what a strict seeking
    // player walks; our own demuxer skips it like any unknown chunk
    def fccAt(b: Array[Byte], o: Int) = new String(b, o, 4, "US-ASCII")
    def u32At(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    var pos = 12
    var moviAt = -1; var idxAt = -1; var idxLen = 0L
    while (pos + 8 <= avi.length) {
      val id = fccAt(avi, pos); val sz = u32At(avi, pos + 4)
      if (id == "LIST" && fccAt(avi, pos + 8) == "movi") moviAt = pos + 8
      if (id == "idx1") { idxAt = pos + 8; idxLen = sz }
      pos += 8 + sz.toInt + (sz.toInt & 1)
    }
    assert(moviAt > 0 && idxAt > 0, "both movi and idx1 must be present")
    assert(idxLen === 16L * frames.length, "one 16-byte idx1 entry per frame")
    frames.indices.foreach { i =>
      val e = idxAt + 16 * i
      assert(fccAt(avi, e) === "00dc" && u32At(avi, e + 4) === 0x10L)
      val off = u32At(avi, e + 8).toInt
      assert(fccAt(avi, moviAt + off) === "00dc",
        s"idx1 entry $i offset must land on its frame chunk header")
      assert(u32At(avi, e + 12) === frames(i).length.toLong)
    }
  }

  test("synthetic video assets are genuine AVIs; metadata dims match the decoded frames") {
    val vids = Multimodal.syntheticAssets(spark, 30).collect().filter(_.kind == "video")
    assert(vids.nonEmpty)
    vids.foreach { a =>
      assert(a.format === "avi")
      val decoded = Multimodal.decodeAviFrames(a.payload)
      assert(decoded.isDefined, s"asset ${a.asset_id} payload is not a demuxable AVI")
      assert(decoded.get.length === 17)
      decoded.get.foreach { im =>
        assert(im.getWidth === a.width && im.getHeight === a.height,
          s"asset ${a.asset_id}: metadata dims must be the true encoded frame dims")
      }
    }
  }

  test("video dedup: every planted variant pair is recovered; unrelated clips never pair; frame edits exercise the tolerance band") {
    val nBase = 200
    val corpus = Multimodal.syntheticVideoCorpus(spark, nBase, everyK = 5)
    val pairs = Multimodal.videoDedupPairs(corpus)
      .collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"),
        r.getAs[Int]("hamming")))
    // planted truth: base i (i % 5 == 0) has a re-containered twin at
    // i + nBase, a brightness-shifted twin at i + 2·nBase and a
    // frame-edited twin at i + 3·nBase; all four are mutual near-dups —
    // 6 pairs per base
    val planted = (0 until nBase by 5).flatMap { i =>
      val ids = Seq(i.toLong, i + nBase.toLong, i + 2L * nBase, i + 3L * nBase)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(planted.subsetOf(found),
      s"missed planted near-dup pairs: ${(planted -- found).toSeq.sorted.take(5)}")
    assert(found === planted,
      s"unrelated clips must never pair at Hamming <= 3: extras = ${(found -- planted).toSeq.sorted.take(5)}")
    // re-containers demux to identical frames, and a +6 brightness shift
    // moves only each JPEG block's DC coefficient — both fingerprint-exact
    // on this clamp-free corpus; the frame-edited twin (ids >= 3·nBase) is
    // the deliberate non-zero case (column interleave on frame 8: h-grad
    // plane only)
    assert(pairs.filter(_._2 < 3L * nBase).forall(_._3 === 0),
      "re-container and brightness variants must be fingerprint-exact")
    val edits = pairs.filter(p => p._1 < nBase && p._2 >= 3L * nBase)
    assert(edits.forall(p => p._3 >= 0 && p._3 <= 3))
    val band = edits.filter(p => p._3 >= 1 && p._3 <= 3)
    assert(band.size >= 10,
      s"expected a healthy population of measured Hamming 1-3 planted pairs " +
        s"(the tolerance band the join exists for), got ${band.size} of ${edits.size}")
  }

  test("video fingerprints are deterministic and partitioning-independent") {
    val corpus = Multimodal.syntheticVideoCorpus(spark, 30, everyK = 5)
    val one = Multimodal.videoFingerprints(corpus.repartition(1))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val many = Multimodal.videoFingerprints(corpus.repartition(7))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(one === many, "fingerprints must not depend on partitioning")
    assert(one.nonEmpty)
  }

  test("audio fingerprints are deterministic and partitioning-independent") {
    val corpus = Multimodal.syntheticAudioCorpus(spark, 30, everyK = 5)
    val one = Multimodal.audioFingerprints(corpus.repartition(1))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val many = Multimodal.audioFingerprints(corpus.repartition(7))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(one === many, "fingerprints must not depend on partitioning")
    assert(one.nonEmpty)
  }

  test("image fingerprints are deterministic and partitioning-independent") {
    val corpus = Multimodal.syntheticImageCorpus(spark, 40, everyK = 7)
    val a = Multimodal.imageFingerprints(corpus).collect()
      .map(_.toString).sorted.toSeq
    val b = Multimodal.imageFingerprints(corpus.repartition(7)).collect()
      .map(_.toString).sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
