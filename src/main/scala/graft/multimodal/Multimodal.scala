package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus partition-batched
  * feature extraction.
  *
  * The Spark-side plumbing (schema, partitioning, batch iteration,
  * output shape) is real and tested; the actual media decode is a
  * clearly-marked deterministic stand-in — this container has no image
  * or audio codecs, so `decodeStub` computes structural features
  * (length, byte histogram, rolling checksum) that exercise the exact
  * same data path a JNI/FFI decoder would.
  *
  * Scale: decode is a mapPartitions pass — no shuffle, arbitrary
  * per-partition native batching; partition sizing is controlled by the
  * usual file-split knobs, and skew (one giant video) is handled by
  * splitting payloads into chunk rows BEFORE decode (chunk()).
  */
object Multimodal {

  final case class MediaAsset(asset_id: Long, kind: String,
                              payload: Array[Byte],
                              width: Int, height: Int, duration_ms: Long)

  final case class MediaFeatures(asset_id: Long, kind: String,
                                 n_bytes: Int, checksum: Long,
                                 head_hist: Array[Long])

  /** Wrap a text corpus as binary media assets (the test stand-in for
    * an object-store manifest of real image/audio files).
    */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("asset_id"),
        lit("text").as("kind"),
        col("text").cast("binary").as("payload"),
        lit(0).as("width"), lit(0).as("height"),
        lit(0L).as("duration_ms"))
      .as[MediaAsset]
  }

  /** STUB decode — stands in for the real codec call. Deterministic
    * structural features only; a production build would swap the body
    * for the JNI/FFI decoder while keeping the signature and the
    * partition-batched driver loop identical.
    */
  private def decodeStub(payload: Array[Byte]): (Long, Array[Long]) = {
    var checksum = 17L
    val hist = new Array[Long](16)
    var i = 0
    while (i < payload.length) {
      checksum = checksum * 31 + (payload(i) & 0xff)
      hist((payload(i) & 0xff) % 16) += 1
      i += 1
    }
    (checksum, hist)
  }

  /** Partition-batched feature extraction over the binary payloads. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real decoders amortize codec init per partition — same shape here
      it.map { a =>
        val (checksum, hist) = decodeStub(a.payload)
        MediaFeatures(a.asset_id, a.kind, a.payload.length, checksum, hist)
      }
    }
  }

  /** Split oversized payloads into fixed-size chunk rows so one giant
    * asset cannot skew a partition.
    */
  def chunk(assets: Dataset[MediaAsset], chunkBytes: Int)
      : DataFrame = {
    import assets.sparkSession.implicits._
    require(chunkBytes > 0, "chunkBytes must be positive")
    assets.flatMap { a =>
      a.payload.grouped(chunkBytes).zipWithIndex.map { case (bytes, i) =>
        (a.asset_id, i, bytes)
      }
    }.toDF("asset_id", "chunk_id", "chunk")
  }

  /** Frame sampling: keep every `stride`-th fixed-size frame of the
    * payload (for video this is the decode-every-Nth-frame pattern; the
    * frame boundary here is a byte window since the real codec is
    * stubbed). Map-only, skew-bounded like chunk().
    */
  def sampleFrames(assets: Dataset[MediaAsset], frameBytes: Int,
                   stride: Int): DataFrame = {
    require(stride > 0, "stride must be positive")
    chunk(assets, frameBytes)
      .filter(org.apache.spark.sql.functions.col("chunk_id") % stride === 0)
      .toDF("asset_id", "frame_id", "frame")
  }
}
