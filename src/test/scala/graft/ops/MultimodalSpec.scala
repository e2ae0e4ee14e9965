package graft.ops

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.fromDocuments(spark,
    Tables.documents(spark, sf("sf0.001")).limit(50))

  test("extractFeatures: per-partition decode keeps schema and determinism") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.length === 50)
    assert(f1.toSeq === f2.toSeq, "features must not depend on partitioning")
    assert(f1.forall(f => f.width >= 64 && f.height >= 64 && f.n_bytes > 0))
  }

  test("resizeStub bounds payload size and tags the mime") {
    val resized = Multimodal.resizeStub(media, maxBytes = 100).collect()
    assert(resized.forall(_.payload.length <= 100))
    assert(resized.forall(_.mime.endsWith(";resized")))
  }

  test("frameSampleStub fans a payload out to strided frames with keyable ids") {
    val frames = Multimodal.frameSampleStub(media, frameBytes = 64, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.payload.length <= 64))
    // frame index recoverable; originals recoverable
    val parents = frames.map(_.media_id / 1000000L).distinct
    assert(parents.length === 50)
    assert(frames.forall(f => (f.media_id % 1000000L) % 2 == 0), "stride 2 → even frames only")
  }
}
