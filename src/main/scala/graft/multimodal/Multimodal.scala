package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque media bytes + typed metadata. At 100 TB the
  * bytes live in parquet binary columns (or pointers to object storage);
  * everything the engine does with them is per-row narrow work that never
  * shuffles the payload.
  */
final case class MediaRecord(
    media_id: Long,
    media_type: String,   // "image" | "audio" | "video" | "text"
    content: Array[Byte],
    width: Option[Int],
    height: Option[Int],
    duration_ms: Option[Long])

final case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    content_md5: String,
    sniffed_format: String,
    feature: Array[Float])  // decoder output (stubbed, see below)

/** Multimodal-column plumbing: schema, format sniffing, digesting, and the
  * batch-shaped decode pipeline. The actual codec step is STUBBED with a
  * deterministic fake (no image/audio libraries in this environment) — the
  * Spark-side contract (binary column in, fixed-width feature out, batched
  * per partition, payload never shuffled) is real and tested.
  */
object Multimodal {

  /** Magic-byte format sniffing as a pure Column expression (first bytes of
    * the binary column, hex-compared). Covers the common containers.
    */
  def sniffFormat(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val head = hex(substring(content, 1, 8))
    when(head.startsWith("FFD8FF"), "jpeg")
      .when(head.startsWith("89504E47"), "png")
      .when(head.startsWith("47494638"), "gif")
      .when(head.startsWith("494433"), "mp3")
      .when(head.startsWith("52494646"), "riff") // wav/avi
      .when(head.startsWith("664C6143"), "flac")
      .otherwise("unknown")
  }

  /** Media metadata as a PURE projection — every emitted column
    * (`octet_length`, `md5`, magic-byte sniff) is a codegen'd Column
    * expression, so the registered metadata query is one scan + project
    * with no object serialization ([[decodeFeatures]] stays the
    * codec-contract API for the stubbed decode step, which genuinely
    * needs per-partition context).
    */
  def meta(df: DataFrame, idCol: String,
           content: org.apache.spark.sql.Column): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      octet_length(content).cast("long").as("n_bytes"),
      md5(content).as("content_md5"),
      sniffFormat(content).as("sniffed_format"))

  /** Deterministic fake "decode": a 16-dim byte-histogram of the payload.
    * STUB for a real codec (libjpeg/ffmpeg are unavailable here); a real
    * deployment swaps `decodeBatch` for the codec call — the partition
    * batching, schema, and shuffle-free shape stay identical.
    */
  private def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) >> 4) += 1f; i += 1 }
    val n = math.max(1, bytes.length).toFloat
    hist.map(_ / n)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  private def sniff(bytes: Array[Byte]): String = {
    def at(i: Int) = if (i < bytes.length) bytes(i) & 0xFF else -1
    if (at(0) == 0xFF && at(1) == 0xD8 && at(2) == 0xFF) "jpeg"
    else if (at(0) == 0x89 && at(1) == 0x50 && at(2) == 0x4E && at(3) == 0x47) "png"
    else if (at(0) == 0x47 && at(1) == 0x49 && at(2) == 0x46) "gif"
    else "unknown"
  }

  /** Batch feature extraction: mapPartitions so a real decoder could reuse
    * one codec context per partition (the Scala analogue of arrow-batched
    * UDF execution). Narrow — no shuffle, payload read once.
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder context would be initialized here
      it.map { r =>
        MediaFeatures(r.media_id, r.media_type, r.content.length.toLong,
          md5Hex(r.content), sniff(r.content), fakeDecode(r.content))
      }
    }
  }

  /** Resize stub: a real deployment decodes, scales, re-encodes; here the
    * output is a deterministic fake (content digest re-keyed by the target
    * box, metadata updated) with the real pipeline shape — per-row narrow
    * transform, payload never shuffled.
    */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        // STUB: stand-in bytes = digest of (content, target box)
        val fake = md5Hex(r.content ++ s"${w}x$h".getBytes("UTF-8"))
          .getBytes("UTF-8")
        r.copy(content = fake, width = Some(w), height = Some(h))
      }
    }
  }

  /** Frame sampling stub: splits the payload into `n` contiguous chunks
    * standing in for decoded frames. The real version calls the codec per
    * partition; schema (media_id, frame_no, frame_bytes) and the
    * shuffle-free shape are what the pipeline depends on.
    */
  def sampleFrames(ds: Dataset[MediaRecord], n: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val step = math.max(1, r.content.length / n)
      (0 until n).iterator.map { i =>
        val from = math.min(i * step, r.content.length)
        val until = math.min(from + step, r.content.length)
        (r.media_id, i, r.content.slice(from, until))
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Build a MediaRecord dataset from any table with a binary-able column —
    * used by tests and the driver queries (text bytes stand in for media
    * payloads; the pipeline does not care what the bytes mean).
    */
  def fromText(spark: SparkSession, df: DataFrame, idCol: String,
               textCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit("text").as("media_type"),
        encode(col(textCol), "UTF-8").as("content"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"))
      .as[MediaRecord]
  }
}
