package graft.media

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: opaque `binary` payloads + typed metadata, with decode /
  * feature-extraction / resize / frame-sampling plumbing.
  *
  * The Spark-side design is real — schema, partition-friendly batch shape,
  * typed Dataset API, narrow per-partition execution — while the actual
  * codec calls are STUBBED with deterministic fakes (image/audio libraries
  * are not available in this container; swap `StubCodec` for a real codec
  * binding at deployment). Everything stays per-row/per-partition: no
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

  /** ===== STUB codec =====
    * Deterministic fakes standing in for real decoders (???-equivalent,
    * kept total so pipelines are runnable/testable end-to-end). A real
    * deployment implements the same signatures over libjpeg/ffmpeg etc.
    */
  object StubCodec {
    /** "Decode" image dimensions from payload bytes (FAKE: derived
      * deterministically from content, not a real header parse). */
    def dimensions(payload: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (32 + math.abs(h % 4096), 32 + math.abs((h / 4096) % 4096))
    }

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

  /** Decode metadata for every media row. Runs as one narrow
    * mapPartitions pass (the batch shape a real codec wants: amortize
    * per-partition codec init, stream rows through). */
  def decodeMetadata(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here
        rows.map { case (id, kind, payload) =>
          val (w, h) = StubCodec.dimensions(payload)
          MediaMeta(id, kind, payload.length.toLong, w, h,
            StubCodec.frameCount(payload, kind),
            java.security.MessageDigest.getInstance("SHA-256")
              .digest(payload).map("%02x".format(_)).mkString)
        }
      }
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

  /** Frame sampling for video rows: every `stride`-th frame index up to
    * the decoded frame count — the explode shape of a real frame
    * extractor (one output row per sampled frame). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val meta = decodeMetadata(media).toDF()
    meta.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1,
          lit(stride))).as("frame_index"))
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
