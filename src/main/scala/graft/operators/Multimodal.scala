package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract
  * run as partition-local batch jobs over the binary column.
  *
  * The actual codec step is STUBBED (no image/audio libs in this
  * container): `decodeStub` derives deterministic fake dimensions/features
  * from the bytes via FNV-1a hashing. The Spark-side plumbing — schema,
  * partitioning, batch iteration shape, feature vector layout — is real and
  * is what a production decode (swapping the stub for e.g. a JNI codec)
  * would reuse unchanged.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
      height: Int, feature: Array[Float])

  private def fnv(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until && i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** STUB decode: a real implementation would parse the container header
    * and run the codec; this derives deterministic fake dims + an 8-dim
    * "embedding" from byte-range hashes so tests are stable. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val b = r.media
    val h = fnv(b, 0, b.length)
    val width = 64 + (((h % 1024) + 1024) % 1024).toInt
    val height = 64 + ((((h >>> 32) % 1024) + 1024) % 1024).toInt
    val chunk = math.max(1, b.length / 8)
    val feature = Array.tabulate(8) { i =>
      val hh = fnv(b, i * chunk, (i + 1) * chunk)
      (((hh % 10000) + 10000) % 10000).toFloat / 10000f
    }
    MediaFeatures(r.doc_id, b.length, width, height, feature)
  }

  /** Real media ingestion: Spark's binaryFile source — one row per blob
    * with (path, modificationTime, length, content). The production entry
    * point for image/audio/video directories; `extractFeatures` runs on
    * its output unchanged. */
  def readMediaDir(spark: org.apache.spark.sql.SparkSession, path: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(xxhash64(col("path")).as("doc_id"), col("path"),
        col("length").as("n_bytes_meta"), col("content").as("media"))

  /** Attach a binary media column (here synthesized from text bytes — the
    * stand-in for reading real blobs) plus typed metadata. */
  def withMediaColumn(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"),
      struct(col("source").as("origin"), col("lang").as("tag")).as("media_meta"))

  /** Partition-local batch decode: mapPartitions so a real codec could
    * amortize per-batch init (model load, JNI handle) across rows —
    * the Scala analog of the mapInPandas batch shape. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[MediaRow]
      .mapPartitions { it => it.map(decodeStub) }
      .toDF()
  }

  /** STUB resize: a real implementation re-rasterizes; the stub scales the
    * fake dims preserving aspect and re-derives the feature from the bytes
    * + target box, keeping determinism. Pure metadata/Column transform —
    * the real-codec version would swap the feature expression for a UDF
    * batch pass like [[extractFeatures]]. */
  def resizeStub(features: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col("width"), col("height")))
    features
      .withColumn("rs_width", ceil(col("width") * scale).cast("int"))
      .withColumn("rs_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling for video-shaped payloads: treat the binary as
    * fixed-size frames, keep every `stride`-th, decode each kept frame.
    * Pure Column ops — `sequence` + `transform` + binary `substring` stay
    * inside WholeStageCodegen, and the explode multiplies rows only by the
    * KEPT frame count (the sampling happens before the explode, which is
    * the point at 100 TB of video). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("media")).cast("double") / frameBytes).cast("int")
    val kept = sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))
    media
      .withColumn("n_frames", nFrames)
      .withColumn("_fr", explode(transform(kept, i =>
        struct(i.as("frame_idx"),
          substring(col("media"), i * frameBytes + 1, lit(frameBytes)).as("frame")))))
      .select(col("doc_id"), col("n_frames"),
        col("_fr.frame_idx").as("frame_idx"), col("_fr.frame").as("frame"))
  }

  case class FrameRow(doc_id: Long, n_frames: Int, frame_idx: Int,
      frame: Array[Byte])
  case class FrameFeat(doc_id: Long, n_frames: Int, frame_idx: Int, f_int: Int)

  /** STUB per-frame decode (integral feature so downstream aggregates stay
    * order-insensitive): FNV of the frame bytes, Java-signed mod 10000. */
  def frameFeatures(frames: DataFrame): DataFrame = {
    val s = frames.sparkSession
    import s.implicits._
    frames.select(col("doc_id").cast("long"), col("n_frames"),
        col("frame_idx"), col("frame"))
      .as[FrameRow]
      .mapPartitions { it =>
        it.map { r =>
          val h = fnv(r.frame, 0, r.frame.length)
          FrameFeat(r.doc_id, r.n_frames, r.frame_idx,
            (((h % 10000L) + 10000L) % 10000L).toInt)
        }
      }
      .toDF()
  }
}
