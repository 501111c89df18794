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

  // ---- REAL codec: RIFF/WAVE PCM16 (pure byte arithmetic) -----------

  /** Canonical 44-byte-header RIFF/WAVE encoder, PCM16 mono LE — a
    * real container format needing no media library, so the audio leg
    * of the multimodal path runs with NO stub: real bytes through a
    * real parser, verified by the oracle gate on the decoded numbers.
    */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** RIFF chunk-walking WAV parser: validates the RIFF/WAVE magic,
    * walks sub-chunks (skipping unknown ones — LIST/INFO etc., with
    * RIFF's odd-size pad byte), reads the fmt chunk (must be PCM16
    * mono) and the data chunk. Returns (sampleRate, samples).
    */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    bb.getInt // riff chunk size
    require(tag() == "WAVE", "not a WAVE file")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      val id = tag()
      val len = bb.getInt
      id match {
        case "fmt " =>
          val fmt = bb.getShort; val ch = bb.getShort
          sampleRate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          val bits = bb.getShort
          require(fmt == 1 && ch == 1 && bits == 16,
            s"unsupported WAV: fmt=$fmt ch=$ch bits=$bits")
          bb.position(bb.position() + (len - 16) + (len & 1))
        case "data" =>
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
        case _ => // skip unknown chunk + RIFF pad byte on odd sizes
          bb.position(bb.position() + len + (len & 1))
      }
    }
    require(sampleRate > 0 && samples != null, "missing fmt or data chunk")
    (sampleRate, samples)
  }

  final case class WavRow(event_id: Long, content: Array[Byte])
  final case class WavStats(event_id: Long, sr: Long, n_samples: Long,
      n_bytes: Long, sum_sq: Long, peak: Long)

  /** Deterministic synthetic waveform per event row (integer sawtooth —
    * exactly recomputable in SQL, no libm), encoded through the REAL
    * WAV encoder: one binary blob per row, the media-ingest shape.
    */
  def synthWavTable(events: DataFrame, nSamples: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { eid =>
        val sr = 8000 + (eid % 8).toInt * 1000
        val samples = Array.tabulate(nSamples)(i =>
          (((eid * 31 + i * 17) % 65536) - 32768).toShort)
        WavRow(eid, encodeWavPcm16(samples, sr))
      }
    }.toDF()
  }

  /** Partition-wise REAL decode: every stat below comes out of the
    * parsed container (header sample rate, data-chunk sample count),
    * in exact integer arithmetic (sum of int16 squares fits long).
    */
  def wavStats(wavs: DataFrame): DataFrame = {
    val spark = wavs.sparkSession
    import spark.implicits._
    wavs.select(col("event_id"), col("content")).as[WavRow]
      .mapPartitions { it =>
        it.map { r =>
          val (sr, samples) = decodeWavPcm16(r.content)
          var sq = 0L; var peak = 0L; var i = 0
          while (i < samples.length) {
            val v = samples(i).toLong
            sq += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            i += 1
          }
          WavStats(r.event_id, sr.toLong, samples.length.toLong,
            r.content.length.toLong, sq, peak)
        }
      }.toDF()
  }
}
