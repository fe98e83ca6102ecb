package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the
  * pipeline as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs as batched partition-local
  * processing.
  *
  * The decode step itself is STUBBED (no codec libraries in this
  * environment): [[FakeCodec]] is a deterministic stand-in that
  * consumes real bytes and emits a fixed-shape feature record. The
  * Spark-side plumbing — schema, encoders, partition-batch processing
  * shape, and column pruning around a binary payload — is real, and is
  * exactly what a production decode (mapInPandas / JNI codec) plugs
  * into.
  */
object Multimodal {

  /** A multimodal record: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, modality: String,
                         payload: Array[Byte], width: Int, height: Int,
                         format: String)

  /** Decoded feature record (fixed shape regardless of codec). */
  case class MediaFeatures(media_id: Long, modality: String,
                           n_bytes: Long, checksum: Long,
                           brightness: Double, n_frames_sampled: Int)

  /** STUB codec: deterministic pseudo-decode.
    * A real implementation would decode payload -> pixels/samples;
    * this computes byte-level stand-ins so the distributed shape is
    * exercised with real data flow. Every output is ENGINE-PORTABLE
    * arithmetic over the payload bytes — the checksum is the 60-bit
    * md5-prefix (TextOps.hex60 over bytes), the brightness an exact
    * integer mean of every sampleEvery-th byte — so the whole decode
    * surface is replayable in any md5-capable SQL engine and the query
    * is hash-verifiable, not rows-only. */
  object FakeCodec {
    /** One codec "handle" per partition (a real decoder would hold
      * native contexts/buffers here); the digest is reused across
      * records via reset-on-digest instead of a per-row JCA lookup. */
    def open(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")

    def decode(md: java.security.MessageDigest, payload: Array[Byte],
               sampleEvery: Int): (Long, Double, Int) = {
      val hexDigest = md.digest(payload).take(8)
        .map(b => f"${b & 0xff}%02x").mkString
      val checksum = java.lang.Long.parseLong(hexDigest.substring(0, 15), 16)
      var sum = 0L
      var sampled = 0
      var i = 0
      while (i < payload.length) {
        if (i % sampleEvery == 0) { sum += (payload(i) & 0xff); sampled += 1 }
        i += 1
      }
      val brightness = if (sampled == 0) 0.0 else sum.toDouble / sampled / 255.0
      (checksum, brightness, sampled)
    }
  }

  /** Build a media table from the documents fixture: text bytes play
    * the payload, metadata is derived deterministically. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      lit("fake/raw").as("format")
    ).as[MediaRecord]
  }

  /** Batched decode over partitions: each partition iterates its
    * records once, calling the codec per record — the mapPartitions
    * shape a vectorized/JNI decoder needs (amortized init per batch,
    * no per-row driver round-trips, binary column never shuffled). */
  def decodeFeatures(media: Dataset[MediaRecord],
                     sampleEvery: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec init: one digest instance per partition
      // (MessageDigest.digest() resets it after each record)
      val md = FakeCodec.open()
      it.map { r =>
        val (checksum, brightness, sampled) =
          FakeCodec.decode(md, r.payload, sampleEvery)
        MediaFeatures(r.media_id, r.modality, r.payload.length.toLong,
          checksum, brightness, sampled)
      }
    }
  }

  /** STUB resize: deterministic down-"scaling" of the payload (every
    * factor-th byte) with metadata scaled to match — the plumbing shape
    * of a real resize (new binary payload + consistent metadata),
    * batched per partition like [[decodeFeatures]]. */
  def resizeStub(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val resized = r.payload.indices.collect {
          case i if i % factor == 0 => r.payload(i)
        }.toArray
        r.copy(payload = resized, width = r.width / factor,
          height = r.height / factor,
          format = s"${r.format};resized/$factor")
      }
    }
  }

  /** Pure-Column variant of the byte-level features that IS
    * SQL-expressible (oracle-checkable): payload size per record. */
  def payloadStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"))

  /** Frame sampling over an opaque payload: fixed-size chunks ("frames")
    * taken every `stride`-th, fingerprinted. Pure Column algebra — the
    * video-pipeline shape (chunk, stride-sample, hash) without a codec,
    * and a per-row map at any scale. */
  def frameSample(docs: DataFrame, chunkChars: Int, stride: Int): DataFrame = {
    val nChunks = floor((length(col("text")) + (chunkChars - 1))
      / (chunkChars * 1.0)).cast("long")
    docs.select(col("doc_id"), col("text"), nChunks.as("n_chunks"))
      .withColumn("sampled", when(col("n_chunks") >= 1, transform(
        sequence(lit(0L), col("n_chunks") - 1, lit(stride.toLong)),
        i => col("text").substr((i * chunkChars + 1).cast("int"),
          lit(chunkChars))))
        .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), col("n_chunks"),
        size(col("sampled")).cast("long").as("n_sampled"),
        md5(concat_ws("", col("sampled"))).as("sample_md5"))
  }
}
