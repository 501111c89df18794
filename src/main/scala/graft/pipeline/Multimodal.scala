package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media travels as opaque `binary`
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as partition-wise batch functions (the Scala
  * analog of `mapInPandas` batches — same shape: one iterator of rows
  * in, one out, per partition).
  *
  * All three modality legs run REAL containers in pure byte
  * arithmetic — RIFF/WAVE PCM16 (audio), BMP 24bpp (image) and
  * YUV4MPEG2 C444 (video) — each with a canonical writer and a
  * validating parser, so no media library is needed and nothing is
  * stubbed on those paths. [[StubCodec]] remains only as the generic
  * any-bytes fallback demonstrating the batch contract for formats
  * that WOULD need an external library (JPEG/MP4 entropy coding);
  * swapping in a real decoder changes only the stub body.
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

  // ---- REAL codec: BMP 24bpp (pure byte arithmetic) -----------------

  /** Canonical BMP writer: BITMAPFILEHEADER (14 bytes) +
    * BITMAPINFOHEADER (40 bytes) + bottom-up 24bpp BGR rows padded to
    * 4-byte boundaries — a real image container needing no media
    * library, so the image leg of the multimodal path runs with NO
    * stub. `pixels` is row-major TOP-DOWN, 3 bytes per pixel (B,G,R);
    * the writer performs the bottom-up flip the format requires.
    */
  def encodeBmp24(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
    val rowSize = (width * 3 + 3) & ~3
    val dataLen = rowSize * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54) // reserved, pixel-array offset
    bb.putInt(40).putInt(width).putInt(height) // positive = bottom-up
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) { // file rows run bottom-up
      bb.put(pixels, y * width * 3, width * 3)
      var p = width * 3
      while (p < rowSize) { bb.put(0.toByte); p += 1 }
      y -= 1
    }
    bb.array()
  }

  /** BMP parser: validates magic/bpp/compression, honors the declared
    * pixel-array offset (extra header blocks between DIB and pixels are
    * legal), walks padded rows, handles both bottom-up (height > 0)
    * and top-down (height < 0) layouts. Returns (width, height,
    * top-down BGR pixels). Fails loudly on malformed input.
    */
  def decodeBmp24(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP file")
    bb.getInt; bb.getInt // file size, reserved
    val pixelOffset = bb.getInt
    val dibSize = bb.getInt
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val width = bb.getInt
    val rawHeight = bb.getInt
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val planes = bb.getShort; val bpp = bb.getShort
    val compression = bb.getInt
    require(planes == 1 && bpp == 24 && compression == 0,
      s"unsupported BMP: planes=$planes bpp=$bpp compression=$compression")
    require(width > 0 && height > 0, s"bad dimensions ${width}x$rawHeight")
    val rowSize = (width * 3 + 3) & ~3
    require(bytes.length >= pixelOffset + rowSize * height, "truncated pixel array")
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val fileRow = if (topDown) y else height - 1 - y
      System.arraycopy(bytes, pixelOffset + fileRow * rowSize,
        out, y * width * 3, width * 3)
      y += 1
    }
    (width, height, out)
  }

  final case class BmpRow(doc_id: Long, content: Array[Byte])
  final case class BmpStats(doc_id: Long, width: Long, height: Long,
      n_bytes: Long, sum_b: Long, sum_g: Long, sum_r: Long, wsum: Long)

  /** Deterministic synthetic image per doc (integer gradient — exactly
    * recomputable in SQL), encoded through the REAL BMP writer.
    * Width/height vary per doc so the row-padding logic is exercised
    * (w=5..10 → pad 1..3 bytes per row).
    */
  def synthBmpTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { did =>
        val w = 5 + (did % 6).toInt
        val h = 3 + (did % 5).toInt
        val px = new Array[Byte](w * h * 3)
        var idx = 0
        while (idx < w * h) {
          px(idx * 3) = ((did * 7 + idx * 3) % 256).toByte
          px(idx * 3 + 1) = ((did * 11 + idx * 5) % 256).toByte
          px(idx * 3 + 2) = ((did * 17 + idx * 2) % 256).toByte
          idx += 1
        }
        BmpRow(did, encodeBmp24(w, h, px))
      }
    }.toDF()
  }

  /** Partition-wise REAL decode: width/height come from the parsed
    * header, channel sums from the de-padded bottom-up-flipped pixel
    * array, and `wsum` weights each pixel by its TOP-DOWN index — a
    * positional checksum that catches row-order or channel-order bugs
    * the plain sums would miss. All exact integer arithmetic.
    */
  def bmpStats(bmps: DataFrame): DataFrame = {
    val spark = bmps.sparkSession
    import spark.implicits._
    bmps.select(col("doc_id"), col("content")).as[BmpRow]
      .mapPartitions { it =>
        it.map { r =>
          val (w, h, px) = decodeBmp24(r.content)
          var sb = 0L; var sg = 0L; var sr = 0L; var ws = 0L
          var idx = 0
          while (idx < w * h) {
            val b = px(idx * 3) & 0xff
            val g = px(idx * 3 + 1) & 0xff
            val rr = px(idx * 3 + 2) & 0xff
            sb += b; sg += g; sr += rr
            ws += (idx + 1).toLong * (b + 2L * g + 3L * rr)
            idx += 1
          }
          BmpStats(r.doc_id, w.toLong, h.toLong, r.content.length.toLong,
            sb, sg, sr, ws)
        }
      }.toDF()
  }

  // ---- REAL codec: YUV4MPEG2 video (pure byte arithmetic) -----------

  /** YUV4MPEG2 writer (C444): ASCII stream header
    * `YUV4MPEG2 W<w> H<h> F25:1 Ip A1:1 C444\n`, then per frame a
    * `FRAME\n` marker followed by three full-resolution planes
    * (Y, U, V — w*h bytes each). A real video container no media
    * library is needed for, so the video leg of the multimodal path
    * runs with NO stub. `frames(f)` is the f-th frame's planes
    * concatenated Y++U++V.
    */
  def encodeY4m(width: Int, height: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    val planeLen = width * height
    frames.foreach(f => require(f.length == planeLen * 3,
      s"frame length ${f.length} != 3 x $planeLen"))
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n"
      .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      header.length + frames.length * (marker.length + planeLen * 3))
    out.put(header)
    frames.foreach { f => out.put(marker); out.put(f) }
    out.array()
  }

  /** YUV4MPEG2 parser: reads the stream header (tagged parameters in
    * any order; requires C444 — subsampled variants would need a real
    * chroma upsampler), then walks `FRAME` markers (ignoring optional
    * per-frame parameters after the tag, which the spec allows) and
    * slices the three planes. Returns (width, height, frames).
    */
  def decodeY4m(bytes: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    var pos = 0
    def readLine(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      require(pos < bytes.length, "unterminated y4m header line")
      pos += 1
      new String(bytes, start, pos - 1 - start, "US-ASCII")
    }
    val header = readLine()
    val toks = header.split(' ')
    require(toks(0) == "YUV4MPEG2", "not a YUV4MPEG2 stream")
    var w = -1; var h = -1; var colorspace = "C420" // format default
    toks.drop(1).foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => w = t.drop(1).toInt
        case 'H' => h = t.drop(1).toInt
        case 'C' => colorspace = t
        case _   => // F/I/A/X parameters don't affect plane layout
      }
    }
    require(w > 0 && h > 0, s"missing/bad dimensions W$w H$h")
    require(colorspace == "C444", s"unsupported colorspace $colorspace")
    val planeLen = w * h
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (pos < bytes.length) {
      val fl = readLine()
      require(fl == "FRAME" || fl.startsWith("FRAME "), s"bad frame marker '$fl'")
      require(pos + planeLen * 3 <= bytes.length, "truncated frame data")
      frames += java.util.Arrays.copyOfRange(bytes, pos, pos + planeLen * 3)
      pos += planeLen * 3
    }
    (w, h, frames.toArray)
  }

  final case class Y4mRow(event_id: Long, content: Array[Byte])
  final case class FrameStats(event_id: Long, frame_idx: Long, width: Long,
      height: Long, sum_y: Long, sum_u: Long, sum_v: Long, wsum: Long)

  /** Deterministic synthetic clip per event (integer pixel formulas —
    * exactly recomputable in SQL), encoded through the REAL Y4M
    * writer. Frame count and dimensions vary per event.
    */
  def synthY4mTable(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { eid =>
        val w = 4 + (eid % 3).toInt
        val h = 2 + (eid % 4).toInt
        val nFrames = 2 + (eid % 5).toInt
        val planeLen = w * h
        val frames = Array.tabulate(nFrames) { f =>
          val buf = new Array[Byte](planeLen * 3)
          var i = 0
          while (i < planeLen) {
            buf(i) = ((eid * 3 + f * 7 + i * 5) % 256).toByte
            buf(planeLen + i) = ((eid * 5 + f * 11 + i * 3) % 256).toByte
            buf(2 * planeLen + i) = ((eid * 13 + f * 2 + i * 7) % 256).toByte
            i += 1
          }
          buf
        }
        Y4mRow(eid, encodeY4m(w, h, frames))
      }
    }.toDF()
  }

  /** Partition-wise REAL frame-sample: parse the container, keep every
    * `every`-th frame, emit one row per kept frame (the one-in-many-out
    * generator/UDTF batch shape) with per-plane sums and a
    * position-weighted checksum — all exact integer arithmetic out of
    * the parsed planes.
    */
  def y4mFrameSample(clips: DataFrame, every: Int): DataFrame = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.select(col("event_id"), col("content")).as[Y4mRow]
      .mapPartitions { it =>
        it.flatMap { r =>
          val (w, h, frames) = decodeY4m(r.content)
          val planeLen = w * h
          frames.iterator.zipWithIndex.filter(_._2 % every == 0).map {
            case (f, idx) =>
              var sy = 0L; var su = 0L; var sv = 0L; var ws = 0L
              var i = 0
              while (i < planeLen) {
                val y = f(i) & 0xff
                val u = f(planeLen + i) & 0xff
                val v = f(2 * planeLen + i) & 0xff
                sy += y; su += u; sv += v
                ws += (i + 1).toLong * (y + 2L * u + 3L * v)
                i += 1
              }
              FrameStats(r.event_id, idx.toLong, w.toLong, h.toLong,
                sy, su, sv, ws)
          }
        }
      }.toDF()
  }
}
