package graft

import org.apache.spark.sql.functions._
import graft.mm.Multimodal
import graft.pages.Pages

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("batched decode: schema, determinism, batch independence") {
    val media = Pages.fromDocuments(spark, Sf).limit(100)
    val a = Multimodal.decodeBatches(spark, media, batchSize = 64).collect()
    val b = Multimodal.decodeBatches(spark, media, batchSize = 7).collect()
    // batch shape must not affect results
    assert(a.map(m => (m.url, m.byte_len, m.width, m.height)).toSet ===
      b.map(m => (m.url, m.byte_len, m.width, m.height)).toSet)
    assert(a.forall(_.kind === "html"))
    assert(a.forall(_.feature.length === 8))
    assert(a.forall(m => m.width >= 64 && m.width < 128))
  }

  test("sampleFrames emits zero frames for empty media (no sequence(0,-1) reversal)") {
    val media = Seq((1L, ""), (2L, "x" * 100)).toDF("doc_id", "s")
      .select(col("doc_id"), encode(col("s"), "UTF-8").as("html"))
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, maxFrames = 8)
    assert(frames.filter(col("doc_id") === 1L).count() === 0)
    assert(frames.filter(col("doc_id") === 2L).count() === 2)
  }

  test("feature column feeds the ANN operators") {
    val media = Pages.fromDocuments(spark, Sf).limit(50)
    val feats = Multimodal.withFeatures(spark, media)
    assert(feats.columns.contains("embedding"))
    val n = feats.filter(size(col("embedding")) === 8).count()
    assert(n === 50)
  }
}
