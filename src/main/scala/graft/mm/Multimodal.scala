package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batches via `mapPartitions`.
  *
  * The actual codec is STUBBED (no image/audio libraries in this container —
  * see the builder brief): [[StubCodec.decode]] derives deterministic fake
  * dimensions/features from the bytes. Everything around it — schema,
  * batching shape, partitioning, the Dataset plumbing — is real and tested,
  * so swapping in a real decoder is a one-function change.
  *
  * Scale: decode is a narrow per-partition pass (no shuffle); batches
  * amortize any per-call setup a real codec would need (model load, JNI
  * context) exactly like `mapInPandas` batches do in PySpark.
  */
object Multimodal {

  case class MediaMeta(url: String, byte_len: Long, kind: String,
                       width: Int, height: Int, feature: Array[Float])

  /** Deterministic stand-in for the real decoder. A real implementation
    * would decode `bytes` (JPEG/PNG/WAV...); the stub derives stable pseudo
    * metadata + an 8-dim feature from a digest of the payload.
    */
  object StubCodec {
    def decode(url: String, bytes: Array[Byte]): MediaMeta = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      def u8(i: Int): Int = d(i) & 0xff
      val kind = if (bytes.length >= 12 && new String(bytes.take(12), "UTF-8").startsWith("<html>"))
        "html" else "binary"
      val feature = (0 until 8).map(i => (u8(i) - 128) / 128.0f).toArray
      MediaMeta(url, bytes.length.toLong, kind,
        64 + u8(8) % 64, 64 + u8(9) % 64, feature)
    }
  }

  /** Batched decode over (url, payload) rows. `batchSize` controls the
    * amortization unit a real codec would see.
    */
  def decodeBatches(spark: SparkSession, media: DataFrame,
                    urlCol: String = "url", binCol: String = "html",
                    batchSize: Int = 64): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col(urlCol).as[String], col(binCol).as[Array[Byte]])
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real codec would init once per batch here
          batch.iterator.map { case (url, bytes) => StubCodec.decode(url, bytes) }
        }
      }
  }

  /** Frame sampling over the opaque media payload: fixed-stride slices stand
    * in for decoded video frames (a real decoder would seek keyframes); one
    * output row per sampled frame with a per-frame content hash. The explode
    * is the Spark-native generator shape a real frame extractor uses — one
    * narrow pass, rows fan out ~maxFrames×, no shuffle.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
                   maxFrames: Int = 8): DataFrame = {
    val s = decode(col("html"), "UTF-8")
    val n = least(ceil(length(s) / lit(frameBytes.toDouble)).cast("int"), lit(maxFrames))
    media.select(col("doc_id"), s.as("__s"), n.as("__n"))
      // empty payload ⇒ __n = 0 and sequence(0, -1) auto-reverses to [0, -1],
      // emitting two spurious frames (one negative-index, substr-from-end);
      // guard the generator so zero-length media emits zero frames
      .withColumn("frame_idx",
        explode(when(col("__n") > 0, sequence(lit(0), col("__n") - 1))
          .otherwise(array().cast("array<int>"))))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        org.apache.spark.sql.graft.TextExpressions.h32(
          col("__s").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
          .as("frame_hash"))
  }

  /** Feature extraction to a fixed-width embedding column suitable for the
    * Ann operators (resize/frame-sample analog).
    */
  def withFeatures(spark: SparkSession, media: DataFrame): DataFrame =
    decodeBatches(spark, media).toDF()
      .select(col("url"), col("byte_len"), col("kind"),
        col("width"), col("height"), col("feature").as("embedding"))
}
