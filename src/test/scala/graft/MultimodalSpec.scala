package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "an image payload"), (1L, "an audio payload"), (2L, "a video payload"),
    (3L, "another image"), (5L, "another video")
  ).toDF("doc_id", "text")

  test("header round-trip: encode then decode recovers typed metadata") {
    val meta = AssetMeta(width = 33, height = 21, sampleRate = 16000, nFrames = 12)
    val bytes = encodeAsset(meta, "payload".getBytes("UTF-8"))
    assert(decodeMeta(bytes).contains(meta))
    assert(decodeMeta(Array[Byte](1, 2, 3)).isEmpty)       // too short
    assert(decodeMeta("not a real header!!".getBytes).isEmpty) // bad magic
  }

  test("synthetic assets: binary column with modality round-robin") {
    val a = syntheticAssets(docs).collect()
    assert(a.length == 5)
    val mods = a.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mods(0L) == "image" && mods(1L) == "audio" && mods(2L) == "video")
    assert(a.forall(_.getAs[Array[Byte]]("bytes").length >= 16))
  }

  test("batched feature extraction: meta + payload stats per asset") {
    val f = extractFeatures(syntheticAssets(docs), batchSize = 2)
      .orderBy("asset_id").collect()
    assert(f.length == 5)
    val r0 = f(0)
    assert(r0.getAs[Long]("n_bytes") == 16L + "an image payload".getBytes("UTF-8").length)
    assert(r0.getAs[Int]("width") == 16 && r0.getAs[Int]("height") == 16)
    assert(r0.getAs[Double]("mean_byte") > 0 && r0.getAs[Double]("byte_entropy") > 0)
    // deterministic: re-running yields identical rows
    val f2 = extractFeatures(syntheticAssets(docs), batchSize = 3)
      .orderBy("asset_id").collect()
    assert(f.sameElements(f2))
  }

  test("resize: image headers updated, payload shrinks, others untouched") {
    val resized = resize(syntheticAssets(docs), width = 8, height = 8)
      .orderBy("asset_id").collect()
    val metas = resized.map { r =>
      r.getLong(0) -> (r.getString(1), decodeMeta(r.getAs[Array[Byte]]("bytes")))
    }.toMap
    // images (doc_id % 3 == 0) carry the new dimensions
    assert(metas(0L)._2.exists(m => m.width == 8 && m.height == 8))
    assert(metas(3L)._2.exists(m => m.width == 8 && m.height == 8))
    // audio/video pass through with original meta
    assert(metas(1L)._2.exists(_.sampleRate == 8000 + 1 * 4000))
    assert(metas(2L)._2.exists(_.nFrames == 1 + 2))
    // deterministic
    val again = resize(syntheticAssets(docs), width = 8, height = 8)
      .orderBy("asset_id").collect()
    assert(resized.sameElements(again))
  }

  test("frame sampling: video-only, strided indices, bounded slices") {
    val frames = sampleFrames(syntheticAssets(docs), everyNth = 2)
      .collect()
    assert(frames.nonEmpty)
    // only video assets (doc_id % 3 == 2)
    assert(frames.map(_.getLong(0)).toSet == Set(2L, 5L))
    val byAsset = frames.groupBy(_.getLong(0))
    // doc 5 → nFrames = 1 + 5%30 = 6 → indices 0,2,4
    assert(byAsset(5L).map(_.getInt(1)).sorted.toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length <= 16))
  }
}
