package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media travels as opaque `binary`
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as partition-wise batch functions (the Scala
  * analog of `mapInPandas` batches — same shape: one iterator of rows
  * in, one out, per partition).
  *
  * The actual codec calls are STUBBED (image/audio libraries are not
  * in this container): [[StubCodec]] derives deterministic fake
  * features from the bytes. The Spark-side contract — schema,
  * partitioning, batch signature — is real and tested; swapping in a
  * real decoder changes only the stub body.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, content: Array[Byte], mime: String,
      n_bytes: Long)
  final case class DecodedRow(doc_id: Long, width: Int, height: Int,
      channels: Int, features: Array[Float])

  /** Wrap a text table as a media table (binary content + metadata) —
    * at scale this is the parquet layout: media bytes inline or as
    * object-store pointers, metadata as ordinary columns.
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"),
      octet_length(col(textCol)).cast("long").as("n_bytes"))

  /** STUB "decode": deterministic pseudo-features from the raw bytes.
    * Replace body with a real codec (e.g. javax.imageio / ffmpeg
    * bindings) — the partition-batch shape stays identical.
    */
  object StubCodec {
    def decode(content: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val n = content.length
      val width = (n % 256).max(1)
      val height = ((n / 256) % 256).max(1)
      val channels = 3
      // 8 deterministic "features": byte sums over 8 stripes
      val features = new Array[Float](8)
      var i = 0
      while (i < n) {
        features(i % 8) += (content(i) & 0xff).toFloat
        i += 1
      }
      (width, height, channels, features)
    }
  }

  /** Partition-wise decode (mapPartitions batch function). */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] = media
      .select(col("doc_id"), col("content"), col("mime"), col("n_bytes"))
      .as[MediaRow]
    typed.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c, f) = StubCodec.decode(r.content)
        DecodedRow(r.doc_id, w, h, c, f)
      }
    }.toDF()
  }

  final case class FrameRow(doc_id: Long, frame_idx: Int, checksum: Long)

  /** STUB "frame-sample" (the video path): the binary content splits
    * into fixed-size byte windows ("frames"); every `every`-th frame is
    * kept and summarized (stub checksum stands in for a real frame
    * decode). One row in -> many out: the generator/UDTF batch shape.
    */
  def frameSample(media: DataFrame, frameBytes: Int, every: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed: Dataset[MediaRow] = media
      .select(col("doc_id"), col("content"), col("mime"), col("n_bytes"))
      .as[MediaRow]
    typed.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.content.length
        val nFrames = (n + frameBytes - 1) / frameBytes
        (0 until nFrames).iterator.filter(_ % every == 0).map { i =>
          var sum = 0L
          var j = i * frameBytes
          val end = math.min(j + frameBytes, n)
          while (j < end) { sum += (r.content(j) & 0xff); j += 1 }
          FrameRow(r.doc_id, i, sum)
        }
      }
    }.toDF()
  }

  /** STUB "resize": scales the fake feature vector — stands in for a
    * real thumbnail/resample pass; demonstrates chained media stages.
    */
  def resize(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(maxDim) / greatest(col("width"), col("height")), lit(1.0))
    // explicit floor: double->int cast truncates in Spark but rounds in
    // other engines; floor is unambiguous
    decoded.select(col("doc_id"),
      floor(col("width") * scale).cast("int").as("width"),
      floor(col("height") * scale).cast("int").as("height"),
      col("channels"), col("features"))
  }
}
