package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed partition-wise.
  *
  * The Spark-side plumbing is real — schema, encoders, per-partition
  * batched iteration (the JVM analogue of `mapInPandas` batch processing),
  * partitioned writes — while the actual media DECODE step is a clearly
  * marked deterministic STUB: the image/audio codec libraries are not in
  * this build, so `decodeStub` derives a reproducible float vector from
  * the payload bytes. Swapping in a real decoder changes one function.
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

  /** Per-partition batched feature extraction — narrow (no shuffle). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // One decoder context per partition (where a real implementation
      // would load the codec/model once per task).
      rows.map(r => MediaFeatures(r.media_id, r.kind, dim,
        decodeStub(r.payload, dim)))
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

  /** Per-partition batched resize of image/video payloads (narrow, like
    * [[extractFeatures]]); audio rows pass through untouched. Metadata is
    * rewritten to the new dimensions. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.kind == "audio") r
        else r.copy(payload = resizeStub(r.payload, w, h),
          meta = r.meta.copy(width = w, height = h))
      }
    }
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
