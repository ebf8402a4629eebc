package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.9 "multimodal columns"): image/audio/
  * video payloads travel as opaque `binary` columns next to typed metadata,
  * and per-asset processing (decode / feature-extract / resize / frame-
  * sample) runs as a partition-parallel typed transformation.
  *
  * The Spark-side plumbing here is REAL and tested (schema, parquet
  * round-trip, Dataset mapPartitions batching, deterministic output) — and
  * so is the IMAGE path: PNG payloads are genuine encoded images, decoded
  * pixel-exactly with the JDK's own `javax.imageio` ([[decodePng]] — no
  * external codec library needed for PNG). Audio/video stay a
  * clearly-marked STUB (`decodeStub` derives features from the payload
  * bytes deterministically) — this container ships no audio/video codecs.
  * Swapping in a real one changes only the stub body (same signature, same
  * batched per-partition call shape a JNI/FFmpeg codec would want).
  */
object Multimodal {

  /** One asset row: payload + typed metadata, the storage schema. */
  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int, sample_rate: Int, format: String)

  /** Extracted per-asset features (fixed-width vector + scalar stats). */
  final case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Int,
                                 checksum: Long, features: Array[Float])

  /** Deterministic synthetic corpus. IMAGE assets carry a REAL PNG payload
    * (a seeded RGB pattern encoded with ImageIO on the executor — the
    * metadata dims are the true encoded dims); audio/video payloads are a
    * keyed byte pattern (stand-in for real encoded media). */
  def syntheticAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = if (i % 3 == 0) "image" else if (i % 3 == 1) "audio" else "video"
      val (w, h) = (16 + (i % 16).toInt, 12 + (i % 12).toInt)
      val payload =
        if (kind == "image") syntheticPng(i, w, h)
        else Array.tabulate[Byte](64 + (i % 37).toInt)(j => ((i * 31 + j * 7) % 251).toByte)
      Asset(i, kind, payload, w, h,
            if (kind == "audio") 16000 else 0, if (kind == "image") "png" else "raw")
    }
  }

  /** A seeded w×h RGB test card, PNG-encoded (lossless — decoders recover
    * the exact per-pixel values, which is what makes [[decodePng]]'s stats
    * assertable). */
  private[graft] def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((seed * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((seed * 17 + x * 11 + y * 3) % 256).toInt
        val b = ((seed * 23 + x * 5 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** STUB decoder — deterministic features from payload bytes. A real
    * implementation decodes the media (JPEG/WAV/frame-sampled video) here;
    * everything around this call — batching, schema, partition parallelism —
    * is production plumbing. */
  private[graft] def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum = checksum * 131 + (payload(i) & 0xff); i += 1 }
    val feats = Array.tabulate(8) { k =>
      var acc = 0L
      var j = k
      while (j < payload.length) { acc += (payload(j) & 0xff); j += 8 }
      (acc % 997).toFloat / 997f
    }
    (checksum, feats)
  }

  /** REAL PNG decode via the JDK's `javax.imageio` (ships in every JRE —
    * no external codec needed for PNG): pixel-exact per-channel stats over
    * the decoded raster, all normalized to [0, 1]:
    * `[w/1024, h/1024, meanR, meanG, meanB, meanLuma, stdLuma, w/(w+h)]`,
    * plus a pixel checksum (the polynomial hash over the RGB raster — the
    * same rolling form as [[decodeStub]]'s byte hash, but over DECODED
    * pixels, so two different encodings of the same image agree). Returns
    * None for an undecodable payload so callers fall back to the stub. */
  private[graft] def decodePng(payload: Array[Byte]): Option[(Long, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
        var checksum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val argb = img.getRGB(x, y)
            val r = (argb >> 16) & 0xff
            val g = (argb >> 8) & 0xff
            val b = argb & 0xff
            val l = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            sr += r; sg += g; sb += b; sl += l; sl2 += l * l
            checksum = checksum * 131 + (argb & 0xffffff)
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        val meanL = sl / n
        Some((checksum, Array[Float](
          w / 1024f, h / 1024f,
          (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
          meanL.toFloat,
          math.sqrt(math.max(0.0, sl2 / n - meanL * meanL)).toFloat,
          w.toFloat / (w + h))))
      }
    } catch { case _: Exception => None }

  /** Partition-parallel feature extraction: one `mapPartitions` pass so a
    * real codec could amortize per-partition init (model load, JNI handle)
    * across its batch — the Scala twin of the Arrow-batched Python UDF
    * pattern. PNG images take the REAL decode path ([[decodePng]]);
    * audio/video (and undecodable payloads) fall back to the stub. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init for a real decoder would go here
      it.map { a =>
        val real =
          if (a.kind == "image" && a.format == "png") decodePng(a.payload)
          else None
        val (checksum, feats) = real.getOrElse(decodeStub(a.payload))
        AssetFeatures(a.asset_id, a.kind, a.payload.length, checksum, feats)
      }
    }
  }

  /** Feature table as a DataFrame keyed for downstream joins. */
  def featureFrame(assets: Dataset[Asset]): DataFrame =
    extractFeatures(assets).toDF()
      .repartition(col("kind")) // co-locate per-modality processing downstream

  /** §2.9 multimodal (no-oracle; rows/schema smoke in CORRECTNESS, contracts
    * in MultimodalSpec): the declared feature-extraction query over the
    * deterministic synthetic corpus — the sfDir carries no media, so the
    * corpus is generated (`sfDir` ignored); the feature vector is flattened
    * to a CSV string so every output column is scalar. */
  def qMultimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    featureFrame(syntheticAssets(spark, 300))
      .select(col("asset_id"), col("kind"), col("n_bytes"), col("checksum"),
        array_join(transform(col("features"), f => f.cast("string")), ",")
          .as("features_csv"))
      .orderBy("asset_id")

  /** One sampled frame of a video payload. */
  final case class Frame(asset_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling: each video asset explodes into every k-th fixed-size
    * frame — the one-to-many generator shape (typed flatMap keeps the
    * explosion partition-parallel; no driver involvement, no shuffle).
    * Frame extraction is a STUB byte-slice — a real demuxer yields decoded
    * frames here with the same one-row-in, n-rows-out contract. */
  def sampleFrames(assets: Dataset[Asset], frameSize: Int = 16,
                   everyK: Int = 2): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val nFrames = a.payload.length / frameSize
      (0 until nFrames by everyK).iterator.map { i =>
        Frame(a.asset_id, i, a.payload.slice(i * frameSize, (i + 1) * frameSize))
      }
    }
  }

  /** Resize: payload rewritten for the target dimensions, metadata updated
    * in the same row — the transform-in-place shape (pure map, the payload
    * never leaves the executor). The pixel math is a STUB byte-stride
    * subsample; a real implementation decodes, scales, and re-encodes in
    * its place. */
  def resize(assets: Dataset[Asset], targetW: Int, targetH: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.map { a =>
      val targetLen = math.max(1, math.min(a.payload.length, targetW * targetH / 64))
      val stride = math.max(1, a.payload.length / targetLen)
      val resized = Array.tabulate[Byte](targetLen)(j =>
        a.payload(math.min(j * stride, a.payload.length - 1)))
      a.copy(payload = resized, width = targetW, height = targetH)
    }
  }
}
