package graft.media

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: opaque `binary` payloads + typed metadata, with decode /
  * feature-extraction / resize / frame-sampling plumbing.
  *
  * The Spark-side design is real — schema, partition-friendly batch shape,
  * typed Dataset API, narrow per-partition execution. IMAGE decode is
  * REAL since r12 ([[Multimodal.ImageIoCodec]]: the JDK's ImageIO —
  * PNG/GIF/BMP/JPEG header parse, pixel decode, true GIF frame
  * counts); audio/video codec calls remain STUBBED with deterministic
  * fakes (those libraries are not in this container; swap `StubCodec`
  * for an ffmpeg binding at deployment). Everything stays per-row/per-partition: no
  * shuffle is introduced by any operation here, so media transforms
  * pipeline with whatever partitioning the surrounding job chose — at
  * 100 TB the payload bytes dominate, and these operators never move them.
  */
object Multimodal {

  /** Media row contract: payload is opaque bytes; metadata is typed. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),       // image | audio | video
    StructField("payload", BinaryType),
    StructField("source_uri", StringType)))

  case class MediaMeta(media_id: Long, kind: String, byte_len: Long,
                       width: Int, height: Int, n_frames: Int,
                       sha: String)

  case class MediaFeatures(media_id: Long, features: Array[Float])

  case class ImageStats(media_id: Long, width: Int, height: Int,
                        n_pixels: Long, chan_sum: Long,
                        mean_luma_micros: Long)

  case class AudioStats(media_id: Long, channels: Int,
                        sample_rate: Long, n_samples: Long,
                        dur_micros: Long, sample_sum: Long,
                        peak: Long)

  /** Codec seam: the per-payload calls [[decodeMetadata]] dispatches
    * through. Implementations must be closure-serializable (objects
    * are). [[ImageIoCodec]] is the REAL JDK decode path;
    * [[StubCodec]] the deterministic fake for formats with no local
    * decoder (audio/video codecs are not in this container). */
  trait MediaCodec extends Serializable {
    def dimensions(payload: Array[Byte], kind: String): (Int, Int)
    def frameCount(payload: Array[Byte], kind: String): Int
  }

  /** ===== STUB codec =====
    * Deterministic fakes standing in for real decoders (???-equivalent,
    * kept total so pipelines are runnable/testable end-to-end). A real
    * deployment implements the same signatures over libjpeg/ffmpeg etc.
    * Since r12, IMAGE formats the JDK ships readers for (PNG, BMP, GIF,
    * JPEG, WBMP) have a real path — [[ImageIoCodec]]; the stub remains
    * the fallback for audio/video and unclaimable bytes.
    */
  object StubCodec extends MediaCodec {
    /** "Decode" image dimensions from payload bytes (FAKE: derived
      * deterministically from content, not a real header parse). */
    def dimensions(payload: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (32 + math.abs(h % 4096), 32 + math.abs((h / 4096) % 4096))
    }

    def dimensions(payload: Array[Byte], kind: String): (Int, Int) =
      dimensions(payload)

    /** "Decode" frame count for video (FAKE). */
    def frameCount(payload: Array[Byte], kind: String): Int =
      if (kind == "video") 1 + math.abs(java.util.Arrays.hashCode(payload) % 300)
      else 1

    /** "Extract" a fixed-size feature vector (FAKE: byte histogram folded
      * to `dim` buckets, L2-normalized — deterministic and shaped like a
      * real embedding). */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        acc((payload(i) & 0xFF) % dim) += 1f
        i += 1
      }
      val n = math.sqrt(acc.map(x => x * x.toDouble).sum).toFloat
      if (n == 0) acc else acc.map(_ / n)
    }

    /** "Resize": a real impl re-encodes pixels; the stub passes bytes
      * through and the new dims live in metadata. */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = payload
  }

  /** ===== REAL codec (r12) =====
    * The JDK's ImageIO — PNG, GIF, BMP, JPEG and WBMP readers ship in
    * every JRE, no external dependency. `dimensions` is a HEADER-ONLY
    * parse (ImageReader.getWidth/getHeight never decode pixel data —
    * cheap enough for a metadata pass over 100 TB of payloads);
    * `frameCount` asks the reader for its true image count, which on
    * animated GIF is the real frame count. Bytes no registered reader
    * claims return None from the Option variants; [[AutoCodec]] falls
    * back to [[StubCodec]] there so mixed-format corpora stay total. */
  object ImageIoCodec extends MediaCodec {
    private def withReader[A](payload: Array[Byte])
        (f: javax.imageio.ImageReader => A): Option[A] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(iis); Some(f(r)) }
          catch { case scala.util.control.NonFatal(_) => None }
          finally r.dispose()
        }
      } finally iis.close()
    }

    /** (width, height) from the image header, or None if no JDK
      * reader claims the bytes / the header is corrupt. */
    def dimensionsOpt(payload: Array[Byte]): Option[(Int, Int)] =
      withReader(payload)(r => (r.getWidth(0), r.getHeight(0)))

    /** True image count (animated GIF: frame count). `allowSearch` is
      * a full-stream scan — fine per payload, already in codec
      * territory. None when unclaimed. */
    def frameCountOpt(payload: Array[Byte]): Option[Int] =
      withReader(payload)(_.getNumImages(true)).filter(_ > 0)

    /** Full pixel decode of frame 0. None when unclaimed/corrupt. */
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

    def dimensions(payload: Array[Byte], kind: String): (Int, Int) =
      dimensionsOpt(payload).getOrElse(StubCodec.dimensions(payload))
    def frameCount(payload: Array[Byte], kind: String): Int =
      frameCountOpt(payload)
        .getOrElse(StubCodec.frameCount(payload, kind))
  }

  /** Default dispatch: real ImageIO parse for image-kind rows, stub
    * for everything else (and, via ImageIoCodec's own fallback, for
    * image bytes no reader claims). */
  object AutoCodec extends MediaCodec {
    def dimensions(payload: Array[Byte], kind: String): (Int, Int) =
      if (kind == "image") ImageIoCodec.dimensions(payload, kind)
      else StubCodec.dimensions(payload)
    def frameCount(payload: Array[Byte], kind: String): Int =
      if (kind == "image") ImageIoCodec.frameCount(payload, kind)
      else StubCodec.frameCount(payload, kind)
  }

  /** Decode metadata for every media row. Runs as one narrow
    * mapPartitions pass (the batch shape a real codec wants: amortize
    * per-partition codec init, stream rows through). Default codec is
    * the stub (back-compat: callers with non-image payloads tagged
    * kind="image" would otherwise change dims under them); pass
    * [[AutoCodec]]/[[ImageIoCodec]] for the real parse. */
  def decodeMetadata(media: DataFrame,
                     codec: MediaCodec = StubCodec): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here
        rows.map { case (id, kind, payload) =>
          val (w, h) = codec.dimensions(payload, kind)
          MediaMeta(id, kind, payload.length.toLong, w, h,
            codec.frameCount(payload, kind),
            java.security.MessageDigest.getInstance("SHA-256")
              .digest(payload).map("%02x".format(_)).mkString)
        }
      }
  }

  /** REAL image statistics — a genuine ImageIO pixel decode per row:
    * dimensions from the decoded raster plus the exact integer channel
    * sum (r+g+b over every pixel) and a mean-luminance in integer
    * micro-units (chan_sum·10⁶ div 3n — truncating integer division,
    * engine-portable, no double midpoint hazard). Rows whose bytes no
    * JDK reader decodes are DROPPED (the quarantine-filter shape; pair
    * with [[decodeMetadata]] to count them). Narrow mapPartitions —
    * payload bytes never shuffle. */
  def imageStats(media: DataFrame): Dataset[ImageStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        ImageIoCodec.decode(payload).map { img =>
          val w = img.getWidth; val h = img.getHeight
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          ImageStats(id, w, h, n, sum, sum * 1000000L / (3L * n))
        }
      })
  }

  /** ===== REAL audio codec (r13) =====
    * The JDK's javax.sound.sampled WAV reader (java.desktop ships in
    * every JRE beside ImageIO): AudioSystem parses the RIFF/fmt
    * chunks into an AudioFormat, and the PCM sample stream decodes
    * here into exact integer statistics. Bytes the audio system
    * doesn't claim return None (the ImageIoCodec quarantine shape). */
  object WavCodec {

    /** Parse + full PCM decode: (channels, sampleRate, nSamples,
      * exact signed sample sum, peak = max |sample|) for 8- or
      * 16-bit PCM WAV. None on unclaimed/corrupt/unsupported. */
    def decodeOpt(payload: Array[Byte])
        : Option[(Int, Long, Long, Long, Long)] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val bits = fmt.getSampleSizeInBits
          val enc = fmt.getEncoding
          val ok = (bits == 16 || bits == 8) &&
            (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
             enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
          if (!ok) None
          else {
            val bytes = in.readAllBytes()
            val bytesPer = bits / 8
            val n = bytes.length / bytesPer
            var sum = 0L
            var peak = 0L
            var i = 0
            while (i < n) {
              val v: Long =
                if (bits == 16) {
                  val lo = bytes(2 * i) & 0xFF
                  val hi = bytes(2 * i + 1).toLong
                  val raw = (hi << 8) | lo
                  if (fmt.isBigEndian)
                    ((bytes(2 * i).toLong << 8) | (bytes(2 * i + 1) & 0xFF))
                  else raw
                } else {
                  if (enc == javax.sound.sampled
                        .AudioFormat.Encoding.PCM_UNSIGNED)
                    (bytes(i) & 0xFF).toLong - 128L
                  else bytes(i).toLong
                }
              sum += v
              val a = math.abs(v)
              if (a > peak) peak = a
              i += 1
            }
            Some((fmt.getChannels, fmt.getSampleRate.toLong,
              n.toLong / fmt.getChannels, sum, peak))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL audio statistics — a genuine JDK WAV parse + PCM decode per
    * row: channels and sample rate from the parsed format, exact
    * integer sample sum and peak from the decoded stream, duration in
    * integer micro-units (n·10⁶ div rate — truncating, portable).
    * Unclaimed/corrupt payloads are DROPPED (the [[imageStats]]
    * quarantine-filter shape). Narrow mapPartitions — payload bytes
    * never shuffle. */
  def audioStats(media: DataFrame): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        WavCodec.decodeOpt(payload).map {
          case (ch, rate, n, sum, peak) =>
            AudioStats(id, ch, rate, n,
              if (rate > 0) n * 1000000L / rate else 0L, sum, peak)
        }
      })
  }

  /** Deterministic synthetic 16-bit PCM mono WAV at 8 kHz:
    * n = 100 + id mod 400 samples, sample k =
    * ((id·31 + k·7) mod 2003) − 1001 — the audio twin of
    * [[syntheticPng]]: a decoder that really parses the RIFF header
    * and PCM data recovers exactly these values, so an engine-free
    * oracle verifies REAL decode output from the formula. */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = (100 + id % 400).toInt
    val rate = 8000
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var k = 0
    while (k < n) {
      bb.putShort((((id * 31 + k * 7) % 2003) - 1001).toShort)
      k += 1
    }
    bb.array()
  }

  /** Deterministic synthetic PNG: a left/right banded grayscale image
    * whose dimensions and pixel values derive from `id` alone —
    * w = 8 + id mod 24, h = 8 + id mod 16, left w div 2 columns gray
    * g1 = id mod 256, the rest g2 = 7·id mod 256. The codec-path
    * fixture generator: a decoder that really parses the bytes
    * recovers exactly these values, so an engine-free oracle can
    * verify REAL decode output from the formula. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = (8 + id % 24).toInt; val h = (8 + id % 16).toInt
    val g1 = (id % 256).toInt; val g2 = (id * 7 % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = if (x < w / 2) g1 else g2
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic animated GIF with 1 + id mod 7 frames
    * (each a 4×4 solid gray of the frame index) — the multi-frame
    * fixture for the real [[ImageIoCodec.frameCountOpt]] path. */
  def syntheticGif(id: Long): Array[Byte] = {
    val frames = (1 + id % 7).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersBySuffix("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until frames).foreach { f =>
      val img = new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = (f * 36) % 256
      (0 until 4).foreach(y => (0 until 4).foreach(x =>
        img.setRGB(x, y, (g << 16) | (g << 8) | g)))
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  /** Feature extraction -> (media_id, features[dim]), ready to feed the
    * graft.sim similarity operators. Narrow; pipelines with upstream
    * partitioning. */
  def extractFeatures(media: DataFrame, dim: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        MediaFeatures(id, StubCodec.features(payload, dim))
      })
  }

  /** Frame sampling: every `stride`-th frame index up to the decoded
    * frame count — the explode shape of a real frame extractor (one
    * output row per sampled frame). Defaults keep the r11 contract
    * (stub codec over kind="video" rows); pass [[ImageIoCodec]] with
    * kinds=Seq("image") for REAL animated-GIF frame counts. */
  def sampleFrames(media: DataFrame, stride: Int,
                   codec: MediaCodec = StubCodec,
                   kinds: Seq[String] = Seq("video")): DataFrame = {
    val meta = decodeMetadata(media, codec).toDF()
    meta.filter(col("kind").isin(kinds: _*))
      .select(col("media_id"),
        explode(sequence(lit(0L), (col("n_frames") - 1).cast("long"),
          lit(stride.toLong))).as("frame_index"))
  }

  /** Column-level metadata that needs no codec — pure built-ins, usable
    * in any engine: payload size and content digest. */
  def byteLen(payload: Column): Column = octet_length(payload).cast("long")
  def contentSha(payload: Column): Column = sha2(payload, 256)

  /** 62-bit perceptual average-hash of a binary payload — the native
    * [[graft.functions.NativeExpressions.AHash62]] (one tight byte
    * loop); see its scaladoc for the block/cross-multiply contract.
    * Near-identical payloads (a few bytes shifted/changed) land within
    * small Hamming distance, so banding + `bit_count(a ^ b)` gives the
    * media near-dup join the same shape as the simhash text path. */
  def aHash62(payload: Column): Column =
    graft.functions.NativeExpressions.ahash62(payload)

  /** Pure-Column twin of [[aHash62]] — the executable spec of the
    * block arithmetic. ASCII-payload + fixture-scale ONLY (reads bytes
    * through a string cast; interpreted lambdas). */
  def aHash62Cols(payload: Column): Column = {
    val s = payload.cast("string")
    val b = transform(sequence(lit(1), length(s)),
      i => call_function("ascii", call_function("substr", s, i, lit(1)))
        .cast("long"))
    val n = size(b).cast("long")
    val tot = aggregate(b, lit(0L), (acc, x) => acc + x)
    val bits = (0 until 62).map { k =>
      val lo = floor(lit(k) * n / lit(62.0)).cast("long")
      val hi = floor(lit(k + 1) * n / lit(62.0)).cast("long")
      val bs = aggregate(
        slice(b, (lo + 1).cast("int"), (hi - lo).cast("int")),
        lit(0L), (acc, x) => acc + x)
      when(bs * n > tot * (hi - lo), lit(1L << k)).otherwise(lit(0L))
    }
    when(length(s) === 0, lit(0L))
      .otherwise(bits.reduce(_ + _))
  }

  /** Raw media INGEST: read a directory tree of binary files (images,
    * audio, video — any bytes) via Spark's `binaryFile` source into the
    * [[mediaSchema]] shape. This is how payloads ENTER the pipeline
    * from a crawl/object store: one row per file with path, length,
    * and content, no decode. `pathGlobFilter` limits to one extension
    * (e.g. `*.jpg`); `kind` tags the rows for the downstream codec
    * ops. Subdirectories are traversed (`recursiveFileLookup`) — the
    * sharded layout every crawl produces.
    *
    * media_id is the portable hash of the path RELATIVE to the ingest
    * root — not the basename: sharded crawls repeat basenames
    * (`part-00000.jpg`, `image.jpg`) across subdirectories, and a
    * basename-keyed id would silently merge distinct payloads. The
    * relative path is unique within one ingest and stable across
    * re-ingests of the same layout (re-runs assign identical ids, and
    * the id survives relocating the whole tree to a new root). Files
    * stream through the vectorized binary reader; payload bytes are
    * never shuffled by anything in this module. */
  def ingestBinaryDir(spark: SparkSession, dir: String, kind: String,
                      glob: String = "*"): DataFrame = {
    // qualify the root exactly as the source will report `path`, so the
    // relative path is a clean prefix strip (no per-row regex)
    val hp = new org.apache.hadoop.fs.Path(dir)
    val root = hp.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(hp).toString
    val rel = col("path").substr(lit(root.length + 2), lit(Int.MaxValue))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", value = true)
      .load(dir)
      .select(
        pmod(pmod(xxhash64(rel), lit(2147483647L)) * 2654435761L,
          lit(2147483647L)).as("media_id"),
        lit(kind).as("kind"),
        col("content").as("payload"),
        col("path").as("source_uri"),
        rel.as("rel_path"),
        col("length").cast("long").as("byte_len"),
        col("modificationTime").as("modified_at"))
  }
}
