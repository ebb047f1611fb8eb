package graft

import graft.model.SchemaParser
import graft.row.RowValidator
import graft.table.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("synthesized multimodal table: schema, determinism, payload shape") {
    val ds = Multimodal.synthesize(spark, 500, seed = 42L, numPartitions = 8)
    val rows = ds.collect()
    assert(rows.length === 500)
    assert(rows.forall(_.payload.length === 128)) // 16 × 8-byte hash words
    assert(rows.map(_.media_id).distinct.length === 500)
    // deterministic across re-generation and partitioning
    val again = Multimodal.synthesize(spark, 500, seed = 42L, numPartitions = 3)
      .collect().map(r => r.media_id -> r.payload.toSeq).toMap
    assert(rows.forall(r => again(r.media_id) == r.payload.toSeq))
  }

  test("metadata struct validates through the row engine") {
    val ds = Multimodal.synthesize(spark, 200, seed = 1L)
    val doc = SchemaParser.parse(Multimodal.metaSchemaJson)
    val meta = ds.select(col("meta.*"))
    val invalid = RowValidator.withValidation(meta, doc)
      .filter(!col("_valid")).count()
    assert(invalid === 0)
    // corrupt modality trips the enum constraint
    val bad = meta.withColumn("modality", lit("hologram"))
    assert(RowValidator.withValidation(bad, doc).filter(!col("_valid")).count() === 200)
  }

  test("feature extraction: mapPartitions batch pass, unit-norm output") {
    val ds = Multimodal.synthesize(spark, 300, seed = 2L, numPartitions = 4)
    val feats = Multimodal.extractFeatures(ds, dim = 32).collect()
    assert(feats.length === 300)
    assert(feats.forall(_.features.length === 32))
    assert(feats.forall(f => math.abs(
      f.features.map(x => x.toDouble * x).sum - 1.0) < 1e-5))
    // deterministic: same payload → same features
    val again = Multimodal.extractFeatures(
      Multimodal.synthesize(spark, 300, seed = 2L, numPartitions = 7), dim = 32)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(feats.forall(f => again(f.media_id) == f.features.toSeq))
  }

  test("frame sampling explodes to n frames per item") {
    val ds = Multimodal.synthesize(spark, 50, seed = 3L)
    val frames = Multimodal.sampleFrames(ds, framesPerItem = 4)
    assert(frames.count() === 200)
    val perItem = frames.groupBy("media_id").count().collect()
    assert(perItem.forall(_.getLong(1) === 4))
  }

  test("exact payload dedup via fingerprint buckets") {
    import spark.implicits._
    val base = Multimodal.synthesize(spark, 100, seed = 4L)
    // duplicate 10 payloads under fresh ids
    val dupes = base.limit(10).map(r => r.copy(media_id = r.media_id + "-copy"))
    val all = base.union(dupes)
    val found = Multimodal.exactPayloadDuplicates(all.toDF(), "media_id", "payload")
    assert(found.count() === 10)
    assert(found.agg(sum("cnt")).collect()(0).getLong(0) === 20)
  }
}
