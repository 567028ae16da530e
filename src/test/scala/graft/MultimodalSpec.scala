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

  test("kind-partitioned write prunes other modalities on scan") {
    val tmp = Files.createTempDirectory("media").toString
    Multimodal.writePartitioned(media, tmp)
    val imgs = spark.read.parquet(tmp).filter(col("kind") === "image")
    assert(imgs.count() == 10)
    val scan = imgs.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || imgs.inputFiles.forall(_.contains("kind=image")))
  }
}
