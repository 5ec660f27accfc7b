package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}

/**
 * Multimodal-column plumbing (north-star extension): image/audio/video
 * as opaque `binary` columns with typed metadata, plus batched
 * decode/feature-extract/frame-sample operators.
 *
 * The DECODE STEP IS A STUB: real codecs (libjpeg/ffmpeg-class
 * libraries) are not available in this environment, so assets carry a
 * deterministic 16-byte synthetic header that [[decodeMeta]] parses in
 * their place. Everything around the stub — the asset schema, the
 * binary column handling, the mapPartitions batch shape (fixed-size
 * batches so a real vectorized decoder amortizes per-batch setup), the
 * frame-sampling explode — is the real Spark plumbing and is tested.
 *
 * Scale posture: assets never leave their partition (no shuffle in
 * decode/extract); batches bound peak memory to batchSize × asset
 * size; frame sampling emits rows, not accumulated arrays.
 */
object Multimodal {

  val Magic: Int = 0x47524654 // "GRFT"

  final case class AssetMeta(width: Int, height: Int, sampleRate: Int, nFrames: Int)
  final case class Asset(asset_id: Long, modality: String, bytes: Array[Byte])
  final case class AssetFeatures(
      asset_id: Long,
      modality: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int,
      mean_byte: Double,
      byte_entropy: Double)
  final case class Frame(asset_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Deterministic synthetic asset: 16-byte header (magic, width,
    * height, sampleRate·nFrames packed) + payload. Stand-in for a real
    * encoded image/audio/video blob. */
  def encodeAsset(meta: AssetMeta, payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(16 + payload.length).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(Magic).putInt(meta.width).putInt(meta.height)
    buf.putShort(meta.sampleRate.toShort).putShort(meta.nFrames.toShort)
    buf.put(payload)
    buf.array()
  }

  /** STUB decode: parses the synthetic header. A production build
    * binds an actual codec here; the call site contract (bytes in,
    * typed meta out, total function on garbage input) is what the
    * pipeline depends on. */
  def decodeMeta(bytes: Array[Byte]): Option[AssetMeta] = {
    if (bytes == null || bytes.length < 16) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    if (buf.getInt() != Magic) None
    else Some(AssetMeta(buf.getInt(), buf.getInt(), buf.getShort().toInt, buf.getShort().toInt))
  }

  /** Build a deterministic asset table from `documents` (modality
    * round-robins by doc_id; payload = UTF-8 text). Lets every
    * multimodal operator run on driver testdata without real media. */
  def syntheticAssets(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val modality = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload = text.getBytes("UTF-8")
        val meta = AssetMeta(
          width = 16 + (id % 64).toInt,
          height = 16 + (id % 48).toInt,
          sampleRate = 8000 + (id % 4).toInt * 4000,
          nFrames = 1 + (id % 30).toInt)
        Asset(id, modality, encodeAsset(meta, payload))
      }(Encoders.product[Asset])
      .toDF()
  }

  /**
   * Batched feature extraction over binary assets via mapPartitions:
   * rows are pulled in fixed-size batches (the shape a vectorized
   * decoder needs — one codec context per batch, not per row). The
   * per-asset features (mean byte, byte entropy) stand in for real
   * decoded statistics.
   */
  def extractFeatures(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("modality"), col("bytes"))
      .as[Asset]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch setup site (codec init in a real build)
          batch.iterator.map { a =>
            val meta = decodeMeta(a.bytes).getOrElse(AssetMeta(0, 0, 0, 0))
            val payload = a.bytes.drop(16)
            val hist = new Array[Long](256)
            var sum = 0.0
            payload.foreach { b => val u = b & 0xff; hist(u) += 1; sum += u }
            val n = payload.length.toDouble
            val entropy =
              if (payload.isEmpty) 0.0
              else -hist.filter(_ > 0).map { c =>
                val p = c / n; p * math.log(p) / math.log(2)
              }.sum
            AssetFeatures(a.asset_id, a.modality, a.bytes.length.toLong,
              meta.width, meta.height, meta.sampleRate, meta.nFrames,
              if (payload.isEmpty) 0.0 else sum / n, entropy)
          }
        }
      }(Encoders.product[AssetFeatures])
      .toDF()
  }

  /**
   * Resize for image assets: re-encodes the header with the target
   * dimensions and stride-subsamples the payload proportionally (the
   * STUB for a real resampling kernel — the header/payload contract
   * and the batched mapPartitions shape are what a codec build swaps
   * in). Non-image assets pass through unchanged.
   */
  def resize(assets: DataFrame, width: Int, height: Int, batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("modality"), col("bytes"))
      .as[Asset]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { a =>
            if (a.modality != "image") a
            else decodeMeta(a.bytes) match {
              case None => a
              case Some(meta) =>
                val payload = a.bytes.drop(16)
                val scale = math.max(1,
                  math.round(meta.width.toDouble * meta.height /
                    math.max(1, width * height)).toInt)
                val resampled = payload.indices.collect {
                  case i if i % scale == 0 => payload(i)
                }.toArray
                a.copy(bytes = encodeAsset(
                  meta.copy(width = width, height = height), resampled))
            }
          }
        }
      }(Encoders.product[Asset])
      .toDF()
  }

  /** Frame sampling for video assets: emit `everyNth`-strided frame
    * indices with a deterministic byte slice per frame (stub for real
    * frame extraction); non-video rows pass through with no frames. */
  def sampleFrames(assets: DataFrame, everyNth: Int = 5): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("modality"), col("bytes"))
      .as[Asset]
      .flatMap { a =>
        if (a.modality != "video") Iterator.empty
        else decodeMeta(a.bytes) match {
          case None => Iterator.empty
          case Some(meta) =>
            val payload = a.bytes.drop(16)
            (0 until meta.nFrames by everyNth).iterator.map { f =>
              val start = if (payload.isEmpty) 0 else (f * 31) % math.max(1, payload.length)
              Frame(a.asset_id, f, payload.slice(start, start + 16))
            }
        }
      }(Encoders.product[Frame])
      .toDF()
  }
}
