package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("media table plumbing: binary payload round-trips through partitioned decode") {
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs)
    assert(media.schema("media").dataType.typeName === "binary")
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).n_bytes === 3L)
    // mean byte of "abc" = (97+98+99)/3 = 98
    assert(math.abs(feats(1L).feature(0) - 98.0f) < 1e-6)
    assert(feats(2L).n_bytes === 0L)
    // deterministic checksum (stub decode is reproducible)
    val again = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f.checksum).toMap
    assert(again === feats.view.mapValues(_.checksum).toMap)
  }

  test("frame sampling keeps every Nth fixed-size chunk") {
    val docs = Seq((1L, "a" * 300)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.asMediaTable(docs),
      frameSize = 64, everyN = 2).collect().sortBy(_.frame_idx)
    // 300 bytes → chunks 0..4 (64,64,64,64,44); kept: 0, 2, 4
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    assert(frames.map(_.n_bytes).toSeq === Seq(64L, 64L, 44L))
  }

  test("repartitioned decode produces identical results (partition-independence)") {
    val docs = Seq.tabulate(50)(i => (i.toLong, s"payload-$i")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs)
    val one = Multimodal.extractFeatures(media.coalesce(1)).collect().sortBy(_.doc_id)
    val many = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.doc_id)
    assert(one.map(_.checksum).toSeq === many.map(_.checksum).toSeq)
  }
}
