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

  test("frame sampling explodes each video into every k-th fixed-size frame") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    val frames = Multimodal.sampleFrames(assets, frameSize = 16, everyK = 2).collect()
    val videos = assets.collect().filter(_.kind == "video")
    assert(videos.nonEmpty && frames.nonEmpty)
    val byAsset = frames.groupBy(_.asset_id)
    assert(byAsset.keySet === videos.map(_.asset_id).toSet,
      "every video (and only videos) should yield frames")
    videos.foreach { v =>
      val expected = (0 until v.payload.length / 16 by 2).toSeq
      val got = byAsset(v.asset_id).map(_.frame_idx).toSeq.sorted
      assert(got === expected, s"asset ${v.asset_id}: frame indices $got != $expected")
      byAsset(v.asset_id).foreach { f =>
        assert(f.frame_bytes.length === 16)
        assert(f.frame_bytes.toSeq ===
          v.payload.slice(f.frame_idx * 16, f.frame_idx * 16 + 16).toSeq)
      }
    }
  }

  test("resize rewrites payload and dimensions in place, keeping keys") {
    val assets = Multimodal.syntheticAssets(spark, 20)
    val orig = assets.collect().sortBy(_.asset_id)
    val resized = Multimodal.resize(assets, 32, 24).collect().sortBy(_.asset_id)
    assert(resized.length === orig.length)
    resized.zip(orig).foreach { case (r, o) =>
      assert(r.asset_id === o.asset_id && r.kind === o.kind)
      assert(r.width === 32 && r.height === 24)
      assert(r.payload.length <= o.payload.length && r.payload.nonEmpty)
    }
    // deterministic across runs
    val again = Multimodal.resize(Multimodal.syntheticAssets(spark, 20), 32, 24)
      .collect().sortBy(_.asset_id)
    resized.zip(again).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.payload, b.payload))
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
}
