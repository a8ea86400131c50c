package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) records — the format the big public web crawls
  * ship in, and therefore the front door of any 100 TB text-pipeline
  * ingest. Two halves:
  *
  *  - [[read]] — parse `.warc` shards into a DataFrame of records.
  *    Parallelism is PER FILE (the real-world contract: a crawl
  *    distribution is tens of thousands of ~1 GB shards; records
  *    inside one shard are length-prefixed sequential bytes with no
  *    index, so the file is the split unit — the same per-file
  *    parallel shape every published WARC processor uses). Memory is
  *    O(one record): the shard STREAMS through a
  *    `PortableDataStream`, never loaded whole.
  *  - [[writeWet]] — emit WET-style conversion records (`WARC-Type:
  *    conversion`, `Content-Type: text/plain`) — the plain-text
  *    sibling format the crawls distribute extracted text in. One
  *    `.warc` shard per partition, written straight from the task
  *    through Hadoop's FileSystem (hdfs:/s3a: paths work); the only
  *    data movement is the caller's own partitioning.
  *
  * Record layout written and parsed (version line, named headers, a
  * blank line, `Content-Length` payload bytes, two CRLFs):
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: conversion\r\n
  * WARC-Record-ID: <urn:md5:...>\r\n
  * WARC-Date: ...\r\n
  * WARC-Target-URI: ...\r\n
  * Content-Type: text/plain\r\n
  * Content-Length: N\r\n
  * \r\n
  * <N payload bytes>\r\n\r\n
  * }}}
  *
  * The writer's `WARC-Date` is a caller parameter with a FIXED
  * default (deterministic output is what makes the round-trip
  * hash-gateable; a production caller passes the crawl timestamp),
  * and `WARC-Record-ID` is the md5 of the target URI — a pure
  * function of the row, so re-running a failed task rewrites
  * identical bytes.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType),
    StructField("record_id", StringType),
    StructField("warc_date", StringType),
    StructField("target_uri", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType, nullable = false),
    StructField("content", BinaryType)))

  private val Crlf = "\r\n".getBytes("UTF-8")

  private def md5Hex(s: String): String = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    dig.map(b => f"$b%02x").mkString
  }

  /** One serialized record (see class doc for the layout). */
  def buildRecord(warcType: String, targetUri: String, warcDate: String,
                  contentType: String, payload: Array[Byte]): Array[Byte] = {
    val header = new StringBuilder
    header.append("WARC/1.0\r\n")
    header.append(s"WARC-Type: $warcType\r\n")
    header.append(s"WARC-Record-ID: <urn:md5:${md5Hex(targetUri)}>\r\n")
    header.append(s"WARC-Date: $warcDate\r\n")
    header.append(s"WARC-Target-URI: $targetUri\r\n")
    header.append(s"Content-Type: $contentType\r\n")
    header.append(s"Content-Length: ${payload.length}\r\n")
    header.append("\r\n")
    val h = header.toString.getBytes("UTF-8")
    val out = new Array[Byte](h.length + payload.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(payload, 0, out, h.length, payload.length)
    System.arraycopy(Crlf, 0, out, h.length + payload.length, 2)
    System.arraycopy(Crlf, 0, out, h.length + payload.length + 2, 2)
    out
  }

  /** Write `(uriCol, textCol)` rows as WET-style conversion records,
    * one `.warc` shard per partition (`part-NNNNN.warc`). Idempotent
    * under task retry (deterministic names + bytes, overwrite
    * create); the caller owns partitioning — shard with
    * [[Sinks.shardCol]] upstream for size-targeted shards.
    *
    * `gzipPerRecord = true` writes `.warc.gz` shards with ONE GZIP
    * MEMBER PER RECORD — the layout the public crawls actually
    * distribute (member boundaries = record boundaries, so an offset
    * index gives record-level random access without decompressing
    * the shard). Java's gzip writes a zero MTIME, so the bytes stay
    * deterministic.
    */
  def writeWet(df: DataFrame, path: String, uriCol: String = "target_uri",
               textCol: String = "text",
               warcDate: String = "2000-01-01T00:00:00Z",
               gzipPerRecord: Boolean = false): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    import org.apache.spark.sql.functions.col
    val serConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val rows = df.select(col(uriCol).cast("string"), col(textCol).cast("string"))
    rows.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val ext = if (gzipPerRecord) ".warc.gz" else ".warc"
        val p = new Path(path, f"part-$pid%05d$ext")
        // ONE Deflater per partition, reset per member: a fresh
        // GZIPOutputStream per record allocates a native deflater per
        // row — the per-row-tax class the 100x anchor keeps catching
        val deflater = if (gzipPerRecord)
          new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true) else null
        try Sinks.writeTaskFile(serConf.value.value, p) { out =>
          it.foreach { r =>
            val rec = buildRecord("conversion", r.getString(0), warcDate,
              "text/plain", r.getString(1).getBytes("UTF-8"))
            if (gzipPerRecord) gzipMember(rec, deflater, out)
            else out.write(rec)
          }
        } finally if (deflater != null) deflater.end()
      }
    }
    Sinks.markSuccess(conf, path)
  }

  /** Write one complete gzip MEMBER (header, raw-deflate body, CRC32 +
    * ISIZE trailer) with a caller-owned reusable [[java.util.zip
    * .Deflater]] (`nowrap = true`, reset here per member). Byte-wise
    * the layout `GZIPOutputStream` produces (zero MTIME — the output
    * stays deterministic).
    */
  private[sources] def gzipMember(data: Array[Byte],
      deflater: java.util.zip.Deflater,
      out: java.io.OutputStream): Unit = {
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
    deflater.reset()
    deflater.setInput(data)
    deflater.finish()
    val buf = new Array[Byte](1 << 16)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      if (n > 0) out.write(buf, 0, n)
    }
    val crc = new java.util.zip.CRC32()
    crc.update(data)
    def le32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    le32(crc.getValue)
    le32(data.length.toLong)
  }

  /** Parse every `.warc` / `.warc.gz` shard under `path` into the
    * [[schema]] record frame. Per-file parallel, per-record memory
    * (the shard streams; see class doc). `.warc.gz` shards stream
    * through `GZIPInputStream`, which reads concatenated members
    * transparently — both the crawl's member-per-record layout and a
    * whole-shard single member parse identically. Malformed shards
    * fail loudly — a crawl ingest must not silently drop records.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    // only pass globs that match something: Hadoop's FileInputFormat
    // throws on a non-matching input pattern, and a directory holds
    // either plain or gzipped shards (or a mix)
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val globs = Seq(s"$path/*.warc", s"$path/*.warc.gz")
      .filter(g => fs.globStatus(new Path(g)).nonEmpty)
    require(globs.nonEmpty, s"no .warc or .warc.gz shards under $path")
    val rdd = spark.sparkContext
      .binaryFiles(globs.mkString(","))
      .flatMap { case (file, pds) =>
        val raw = pds.open()
        val in = new DataInputStream(new BufferedInputStream(
          if (file.endsWith(".gz"))
            new java.util.zip.GZIPInputStream(raw, 1 << 16)
          else raw))
        parseStream(in)
      }
      .map(r => Row(r.warcType, r.recordId, r.warcDate, r.targetUri,
        r.contentType, r.content.length.toLong, r.content))
    spark.createDataFrame(rdd, schema)
  }

  private[sources] case class Rec(warcType: String, recordId: String,
      warcDate: String, targetUri: String, contentType: String,
      content: Array[Byte])

  /** Iterate records off a stream; closes it at EOF. */
  private[sources] def parseStream(in: DataInputStream): Iterator[Rec] =
    new Iterator[Rec] {
      private var nextRec: Rec = _
      private var done = false
      advance()

      private def readLine(): String = {
        val sb = new java.lang.StringBuilder
        var b = in.read()
        while (b != -1 && b != '\n') {
          if (b != '\r') sb.append(b.toChar)
          b = in.read()
        }
        if (b == -1 && sb.length == 0) null else sb.toString
      }

      private def advance(): Unit = {
        // skip record-separator CRLFs / blank lines
        var line = readLine()
        while (line != null && line.isEmpty) line = readLine()
        if (line == null) {
          done = true; in.close(); return
        }
        require(line.startsWith("WARC/"),
          s"expected a WARC version line, got '$line'")
        var headers = Map.empty[String, String]
        var h = readLine()
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          require(i > 0, s"malformed WARC header line '$h'")
          headers += h.substring(0, i).toLowerCase -> h.substring(i + 1).trim
          h = readLine()
        }
        val len = headers.getOrElse("content-length",
          sys.error("WARC record missing Content-Length")).toLong
        require(len <= Int.MaxValue, s"record payload too large: $len")
        val payload = new Array[Byte](len.toInt)
        try in.readFully(payload)
        catch { case _: EOFException =>
          sys.error("truncated WARC record payload") }
        nextRec = Rec(
          headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-record-id", ""),
          headers.getOrElse("warc-date", ""),
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("content-type", ""),
          payload)
      }

      override def hasNext: Boolean = !done

      override def next(): Rec = {
        val r = nextRec
        advance()
        r
      }
    }
}
