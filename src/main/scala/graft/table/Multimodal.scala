package graft.table

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * payloads ride as opaque `binary` columns with a typed metadata struct; the
  * engine validates, partitions, fingerprints, batches, and feature-extracts
  * them without ever interpreting the media encoding on the driver.
  *
  * The actual codecs are NOT in this container, so the decode kernels are
  * deterministic fakes (clearly marked below) — the Spark-side plumbing
  * (schema, per-partition batch shape, constraint validation of metadata,
  * distributed feature extraction) is real and tested (MultimodalSpec).
  *
  * Scale notes: payloads never shuffle — every operator below is either a
  * narrow projection or a `mapPartitions` batch pass; only fixed-size
  * features/metadata flow into joins or aggregations.
  */
object Multimodal {

  /** Canonical multimodal row: opaque payload + typed metadata. */
  case class MediaMeta(modality: String, mimeType: String, width: Int,
                       height: Int, sampleRateHz: Int, durationMs: Long)
  case class MediaRow(media_id: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: String, modality: String,
                           byte_len: Long, fingerprint: Long,
                           features: Array[Float])

  /** Constraint schema for the metadata struct — authored with the §2.7
    * builder; validated by the same row engine as every other column. */
  def metaSchemaJson: String =
    graft.model.Schema.obj(
      "modality" -> graft.model.Schema.string.enumOf("image", "audio", "video"),
      "mimeType" -> graft.model.Schema.string.pattern("^[a-z]+/[a-z0-9.+-]+$"),
      "width" -> graft.model.Schema.integer.min(0).max(16384),
      "height" -> graft.model.Schema.integer.min(0).max(16384),
      "sampleRateHz" -> graft.model.Schema.integer.min(0).max(384000),
      "durationMs" -> graft.model.Schema.integer.min(0)
    ).required("modality", "mimeType").json

  /** Deterministic 64-bit payload fingerprint — pure Column expression
    * (xxhash64 over the bytes), codegen'd, no UDF. */
  def withFingerprint(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("fingerprint", xxhash64(col(payloadCol)))

  /** Exact payload dedup: fingerprint + length bucket then confirm equality.
    * Payload bytes only compare WITHIN a bucket (hash pre-join keeps the
    * shuffle narrow at 100 TB: 16 bytes/row instead of the payload). */
  def exactPayloadDuplicates(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val keyed = df.select(col(idCol), xxhash64(col(payloadCol)).as("fp"),
      length(col(payloadCol)).as("len"))
    keyed.groupBy("fp", "len").agg(count(lit(1)).as("cnt"),
        collect_list(col(idCol)).as("ids"))
      .filter(col("cnt") > 1)
  }

  // ------------------------------------------------------------------
  // Decode / feature-extract kernels. REAL pipelines would call image/audio
  // codecs here (per-partition, batched); this container has none, so the
  // kernels are DETERMINISTIC FAKES of the right shape: they read only the
  // payload bytes and produce stable fixed-dimension output.

  /** STUB decode: a real implementation would parse the container header.
    * Fake: derives "decoded dimensions" from the first payload bytes. */
  private[table] def fakeDecodeDims(payload: Array[Byte]): (Int, Int) =
    if (payload.length < 2) (0, 0)
    else ((payload(0) & 0x7f) * 16 + 16, (payload(1) & 0x7f) * 16 + 16)

  /** STUB feature extraction: a real implementation would run a vision/audio
    * encoder over the decoded frames. Fake: a stable `dim`-dimensional
    * byte-histogram projection — deterministic, batch-friendly, unit-norm. */
  private[table] def fakeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1f
      i += 1
    }
    val norm = math.sqrt(acc.map(x => x.toDouble * x).sum).toFloat
    if (norm > 0) acc.map(_ / norm) else acc
  }

  /** STUB frame sampling: a real implementation would seek to keyframes.
    * Fake: `n` evenly-spaced fixed-width byte windows of the payload. */
  private[table] def fakeFrameSample(payload: Array[Byte], n: Int,
                                     frameBytes: Int = 64): Seq[Array[Byte]] =
    if (payload.isEmpty || n <= 0) Seq.empty
    else (0 until n).map { k =>
      val start = (payload.length.toLong * k / n).toInt
      payload.slice(start, math.min(start + frameBytes, payload.length))
    }

  /** Distributed feature extraction: one `mapPartitions` pass — the batch
    * boundary a real codec would amortize setup over (model load / JNI init
    * happens once per partition, then rows stream through). */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      // per-partition setup would init the decoder here (once, not per row)
      rows.map { r =>
        MediaFeatures(r.media_id, r.meta.modality, r.payload.length.toLong,
          scala.util.hashing.MurmurHash3.bytesHash(r.payload).toLong,
          fakeFeatures(r.payload, dim))
      }
    }
  }

  /** Frame sampling as a typed transformation (video → frames, exploded). */
  def sampleFrames(ds: Dataset[MediaRow], framesPerItem: Int): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      fakeFrameSample(r.payload, framesPerItem).zipWithIndex.map {
        case (frame, idx) => (r.media_id, idx, frame)
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Synthesize a deterministic multimodal table (seeded) for tests/bench:
    * payload bytes derive from xxhash64 chains — fully distributed, no driver
    * materialization, same generator discipline as TokenSeqs.synthesize. */
  def synthesize(spark: SparkSession, rows: Long, seed: Long = 42L,
                 numPartitions: Int = 0): Dataset[MediaRow] = {
    import spark.implicits._
    val base = if (numPartitions > 0) spark.range(0, rows, 1, numPartitions)
               else spark.range(rows)
    base.select(
      concat(lit("m-"), lpad(conv(abs(xxhash64(col("id"), lit(seed))).cast("string"),
        10, 16), 12, "0")).as("media_id"),
      // payload: 256 pseudo-random bytes from hash chains
      to_binary(concat_ws("", (0 until 16).map(k =>
        lpad(hex(xxhash64(col("id"), lit(seed), lit(k))), 16, "0")): _*), lit("hex"))
        .as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(xxhash64(col("id"), lit(seed + 1)), lit(3)) + 1).cast("int")).as("modality"),
        lit("application/octet-stream").as("mimeType"),
        (pmod(xxhash64(col("id"), lit(seed + 2)), lit(4096)) + 1).cast("int").as("width"),
        (pmod(xxhash64(col("id"), lit(seed + 3)), lit(4096)) + 1).cast("int").as("height"),
        lit(16000).as("sampleRateHz"),
        (pmod(xxhash64(col("id"), lit(seed + 4)), lit(600000)) + 1).as("durationMs")
      ).as("meta")
    ).as[MediaRow]
  }
}
