package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed multimodal decode pipeline: the `mapPartitions` batch shape a real
  * image/audio/video feature extractor runs in (builder brief: "make the
  * Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
  * real and tested").
  *
  * The container ships no codecs, so [[decodeStub]] is a clearly-marked
  * deterministic FAKE decoder (md5-derived bytes); swapping in a real one
  * (JPEG decode, mel-spectrogram, frame grab) changes only that function —
  * the partition-wise batching, the typed row contracts, and the plan shape
  * (one narrow mapPartitions stage, no shuffle, no driver collect) stay.
  *
  * Why mapPartitions and not a per-row UDF: real decoders amortize per-batch
  * setup (codec contexts, model weights, pinned buffers) across a partition;
  * the iterator-in/iterator-out signature below is the JVM analog of a
  * vectorized batch UDF and processes rows lazily, spill-free.
  */
object MediaPipeline {

  /** Input contract: one media item — opaque payload + typed metadata. */
  final case class MediaItem(
      itemId: Long,
      mediaType: String,       // "image" | "audio" | "video"
      payload: Array[Byte],
      metaWidth: Int,
      metaHeight: Int)

  /** Output contract: fixed-width feature row per item. */
  final case class MediaFeatures(
      itemId: Long,
      mediaType: String,
      nBytes: Long,
      features: Array[Float])

  val featureDim = 8

  /** STUB decoder — stands in for image/audio decode + feature extract
    * (no codec libraries ship in this container).
    * Deterministic: feature i = byte i of md5(payload) scaled to [0, 1).
    * A real implementation replaces ONLY this function. */
  private[operators] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    Array.tabulate(featureDim)(i => (d(i) & 0xff) / 256.0f)
  }

  /** The pipeline: one narrow stage, per-partition batch decode.
    * Decoder is a parameter so tests can inject and production can swap. */
  def extractFeatures(
      items: Dataset[MediaItem],
      decoder: Array[Byte] => Array[Float] = decodeStub): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition setup would happen HERE (codec init, model load) —
      // amortized across the whole partition, not paid per row.
      it.map { item =>
        MediaFeatures(item.itemId, item.mediaType,
          item.payload.length.toLong, decoder(item.payload))
      }
    }
  }

  /** Build a typed media dataset from the documents table, treating text
    * bytes as the opaque payload (the sf* fixtures carry no real media). */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    graft.sources.Tables.load(spark, dir, "documents")
      .selectExpr("doc_id AS itemId", "'image' AS mediaType",
        "CAST(text AS BINARY) AS payload",
        "CAST(n_chars AS INT) AS metaWidth", "CAST(1 AS INT) AS metaHeight")
      .as[MediaItem]
  }
}
