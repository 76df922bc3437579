package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch decoders.
  *
  * The Spark-side architecture here is real and tested — schema, typed
  * Dataset boundary, partition-batched iteration (the Scala analog of a
  * pandas-batched UDF), output size control — while the actual media
  * decode is STUBBED: this container ships no image/audio codecs, so
  * [[decodeFeatures]] derives deterministic fake features from the raw
  * bytes. Swapping in a real decoder changes only the marked function
  * body, not the pipeline shape.
  */
object Multimodal {

  /** Typed decoded-features row (what a real image decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      content_sha: String,
      width: Int,
      height: Int,
      channels: Int,
      histogram: Array[Double])

  /** Attach an opaque binary media column (in the test harness the
    * document text stands in for real media bytes; real sources read
    * `binaryFile` / parquet binary columns).
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"))

  /** Per-partition batch "decode" of binary media into typed features.
    *
    * STUB — deterministic fake decode: dimensions and histogram are
    * derived from the byte content (md5 + byte histogram) instead of a
    * codec. ??? -> replace the body of `decodeOne` with e.g. javax.imageio
    * / ffmpeg bindings in a real deployment.
    */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val s2 = media.sparkSession; import s2.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // batch-scoped setup would construct the codec once per partition
        batch.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }

  private def decodeOne(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val sha = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    // fake dimensions from content hash; fake 4-bin byte histogram
    val w = 64 + (java.lang.Long.parseLong(sha.substring(0, 4), 16) % 192).toInt
    val h = 64 + (java.lang.Long.parseLong(sha.substring(4, 8), 16) % 192).toInt
    val hist = new Array[Double](4)
    bytes.foreach(b => hist(((b & 0xff) >> 6)) += 1.0)
    val total = math.max(1.0, bytes.length.toDouble)
    MediaFeatures(id, bytes.length, sha, w, h, 3, hist.map(_ / total))
  }

  /** "Resize": deterministic metadata transform preserving the stubbed
    * contract (a real implementation re-encodes pixels).
    */
  def resize(features: Dataset[MediaFeatures], maxSide: Int): DataFrame = {
    val f = features.toDF()
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")))
    f.select(col("doc_id"),
      (col("width") * scale).cast("int").as("width"),
      (col("height") * scale).cast("int").as("height"),
      col("content_sha"))
  }

  /** "Frame sampling" for video-like media: emit every `everyN`-th chunk
    * of the byte stream as a frame row (real impl: container demux).
    */
  def sampleFrames(media: DataFrame, chunkBytes: Int, everyN: Int): DataFrame =
    media
      .select(col("doc_id"), col("media"),
        explode(expr(
          s"sequence(0, greatest(0, cast((length(media) - 1) / $chunkBytes AS INT)))"))
          .as("chunk"))
      .where(col("chunk") % everyN === 0)
      .select(col("doc_id"), col("chunk"),
        expr(s"substring(media, chunk * $chunkBytes + 1, $chunkBytes)")
          .as("frame_bytes"))
}
