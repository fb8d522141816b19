package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("media frame schema: opaque binary payload + typed metadata") {
    val media = Multimodal.toMediaFrame(graft.Tables.load(spark, sf, "documents"))
    assert(media.schema.fieldNames.toSeq == Seq("doc_id", "mime", "payload"))
    assert(media.schema("payload").dataType.typeName == "binary")
  }

  test("decodeFeatures: partition-local batch decode with deterministic stub") {
    implicit val s = spark
    import s.implicits._
    val media = Multimodal.toMediaFrame(graft.Tables.load(spark, sf, "documents"))
      .as[Multimodal.MediaRecord]
    val feats = Multimodal.decodeFeatures(media)
    val row = feats.filter(_.doc_id == 0L).collect()(0)
    assert(row.byte_len > 0)
    assert(row.n_frames == row.byte_len / 256)
    assert(row.histogram.sum == row.byte_len)
    assert(row.brightness > 0 && row.brightness < 256)
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media).filter(_.doc_id == 0L).collect()(0)
    assert(again == row.copy(histogram = again.histogram) && again.histogram.toSeq == row.histogram.toSeq)
  }
}
