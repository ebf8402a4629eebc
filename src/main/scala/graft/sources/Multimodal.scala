package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.9 "multimodal columns"): image/audio/
  * video payloads travel as opaque `binary` columns next to typed metadata,
  * and per-asset processing (decode / feature-extract / resize / frame-
  * sample) runs as a partition-parallel typed transformation.
  *
  * The Spark-side plumbing here is REAL and tested (schema, parquet
  * round-trip, Dataset mapPartitions batching, deterministic output); the
  * codec itself is a clearly-marked STUB — this container ships no image/
  * audio libraries, so `decodeStub` derives features from the payload bytes
  * deterministically. Swapping in a real decoder changes only the body of
  * `decodeStub` (same signature, same batched per-partition call shape a
  * JNI/FFmpeg/JPEG codec would want).
  */
object Multimodal {

  /** One asset row: payload + typed metadata, the storage schema. */
  final case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int, sample_rate: Int, format: String)

  /** Extracted per-asset features (fixed-width vector + scalar stats). */
  final case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Int,
                                 checksum: Long, features: Array[Float])

  /** Deterministic synthetic corpus: payload bytes are a keyed byte pattern
    * (stand-in for real encoded media). */
  def syntheticAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = if (i % 3 == 0) "image" else if (i % 3 == 1) "audio" else "video"
      val payload = Array.tabulate[Byte](64 + (i % 37).toInt)(j => ((i * 31 + j * 7) % 251).toByte)
      Asset(i, kind, payload, 64 + (i % 16).toInt, 48 + (i % 12).toInt,
            if (kind == "audio") 16000 else 0, if (kind == "image") "png" else "raw")
    }
  }

  /** STUB decoder — deterministic features from payload bytes. A real
    * implementation decodes the media (JPEG/WAV/frame-sampled video) here;
    * everything around this call — batching, schema, partition parallelism —
    * is production plumbing. */
  private[sources] def decodeStub(payload: Array[Byte]): (Long, Array[Float]) = {
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

  /** Partition-parallel feature extraction: one `mapPartitions` pass so a
    * real codec could amortize per-partition init (model load, JNI handle)
    * across its batch — the Scala twin of the Arrow-batched Python UDF
    * pattern. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init for a real decoder would go here
      it.map { a =>
        val (checksum, feats) = decodeStub(a.payload)
        AssetFeatures(a.asset_id, a.kind, a.payload.length, checksum, feats)
      }
    }
  }

  /** Feature table as a DataFrame keyed for downstream joins. */
  def featureFrame(assets: Dataset[Asset]): DataFrame =
    extractFeatures(assets).toDF()
      .repartition(col("kind")) // co-locate per-modality processing downstream
}
