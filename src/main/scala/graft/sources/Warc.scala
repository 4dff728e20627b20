package graft.sources

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.sql.Timestamp
import java.time.Instant
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import graft.core.Page

/** WARC ingestion — the bridge from raw Common-Crawl segments to the
  * pages table. The reference's equivalent boundary is the S3 payload
  * fetch (/root/reference/ocrworker/s3.py:65-77): an opaque archive
  * holding each document's raw bytes, keyed by an external id. Here the
  * archive is the (public, ISO 28500) WARC format CC actually ships.
  *
  * Spark-idiomatic ingestion: the built-in `binaryFile` DataFrame
  * source reads whole .warc files (CC segments are ~1 GB, naturally
  * one task per file — 100 TB ⇒ ~100k parallel tasks), and a typed
  * flatMap splits records. No RDD, no custom FileFormat needed.
  *
  * Parser scope: WARC/1.0-1.1, `response` records with an HTTP/1.1
  * payload (status line + headers + body). Total: malformed records
  * are skipped, never thrown.
  */
object Warc {

  private val warcDate = DateTimeFormatter.ISO_INSTANT

  // ---- writer (generator side; synthesizes CC-style segments) ---------

  /** Strip CR/LF (and other C0 controls that could confuse header
    * parsing) from a value about to be written on a WARC or HTTP header
    * line — an unsanitized newline would terminate the header early and
    * corrupt record framing for every record after it. */
  private def headerSafe(s: String): String = {
    val v = Option(s).getOrElse("")
    if (v.forall(c => c >= 0x20 || c == '\t')) v
    else v.map(c => if (c >= 0x20 || c == '\t') c else ' ')
  }

  /** Serialize pages into one WARC segment (uncompressed). Headers are
    * UTF-8 per the WARC spec (multibyte target URIs survive); record
    * Content-Length counts BYTES of the http head + body. The raw
    * `text` column rides in an extension header (WARC permits custom
    * fields); header values cannot carry CR/LF, so the text is
    * NEWLINE-NORMALIZED (CR/LF → space) in the header — the roundtrip
    * is lossless only for newline-free text (PageGen's corpus is; a
    * page whose text had newlines would roundtrip with them as
    * spaces, never with broken framing). url/lang are sanitized the
    * same way before being written on header lines. */
  /** One complete WARC response record (headers + HTTP envelope +
    * payload + the record separator) — the unit of segment
    * concatenation, of per-record gzip membership, and of CDX-indexed
    * random access. */
  def recordBytes(p: Page): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(p.html.length + 512)
    def w(s: String): Unit = out.write(s.getBytes(UTF_8))
    val httpHeadBytes = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: application/octet-stream\r\n" +
      s"Content-Language: ${headerSafe(p.lang)}\r\n" +
      s"Content-Length: ${p.html.length}\r\n\r\n").getBytes(UTF_8)
    val httpLen = httpHeadBytes.length + p.html.length
    val rawText = headerSafe(Option(p.text).getOrElse("").replaceAll("[\\r\\n]", " "))
    w("WARC/1.0\r\n")
    w("WARC-Type: response\r\n")
    w(s"WARC-Target-URI: ${headerSafe(p.url)}\r\n")
    w(s"WARC-Date: ${warcDate.format(Instant.ofEpochMilli(p.warc_ts.getTime))}\r\n")
    if (rawText.nonEmpty) w(s"X-Graft-Raw-Text: $rawText\r\n")
    w("Content-Type: application/http; msgtype=response\r\n")
    w(s"Content-Length: $httpLen\r\n\r\n")
    out.write(httpHeadBytes)
    out.write(p.html)
    w("\r\n\r\n")
    out.toByteArray
  }

  def writeSegment(pages: Seq[Page]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(pages.map(_.html.length + 512).sum)
    pages.foreach(p => out.write(recordBytes(p)))
    out.toByteArray
  }

  // ---- parser -----------------------------------------------------------

  /** Parse the response records of a WARC segment lazily — flatMap
    * consumes the iterator directly, so a ~1 GB segment never holds all
    * of its Pages in memory at once (only the raw byte array + the
    * record in flight). Records truncated mid-body are SKIPPED (their
    * urls stay uncommitted, so a later re-run over the complete segment
    * picks them up). */
  def parseSegmentIterator(bytes: Array[Byte]): Iterator[Page] = new Iterator[Page] {
    private val n = bytes.length
    private var i = 0
    private var nextPage: Page = null

    private def advance(): Unit = {
      nextPage = null
      while (nextPage == null && i < n) {
        val start = findBytes(bytes, "WARC/", i)
        if (start < 0) { i = n; return }
        val headEnd = findBytes(bytes, "\r\n\r\n", start)
        if (headEnd < 0) { i = n; return }
        val headers = parseHeaders(new String(bytes, start, headEnd - start, UTF_8))
        val bodyStart = headEnd + 4
        // An unparseable Content-Length (garbage, negative, or >2^31) is
        // treated like a truncated record: SKIP it rather than emit a
        // zero-length payload — the url stays uncommitted and a later
        // re-run over a repaired segment picks it up. We resync by
        // scanning forward for the next "WARC/" magic.
        headers.getOrElse("content-length", "").trim.toIntOption.filter(_ >= 0) match {
          case None =>
            i = bodyStart
          case Some(len) =>
            // Overflow-safe form of `bodyStart + len > n`: a corrupt
            // length near 2^31 would wrap the sum negative and sneak
            // past the bound, crashing copyOfRange instead of resyncing.
            if (len > n - bodyStart) {
              // Body extends past the segment end: either the segment is
              // genuinely truncated (resync finds no further magic and
              // the scan ends) or THIS record's length was corrupted but
              // still parses (e.g. 999999999) — resyncing on the next
              // "WARC/" magic recovers the intact records after it
              // instead of abandoning the rest of the segment.
              i = bodyStart
            } else {
              val bodyEnd = bodyStart + len
              if (headers.getOrElse("warc-type", "") == "response") {
                val uri = headers.getOrElse("warc-target-uri", "")
                val ts = parseDate(headers.getOrElse("warc-date", ""))
                // payload is an HTTP response: body follows the first CRLFCRLF
                val httpBodyStart = findBytes(bytes, "\r\n\r\n", bodyStart) match {
                  case x if x >= 0 && x + 4 <= bodyEnd => x + 4
                  case _ => bodyStart
                }
                val httpHead = new String(bytes, bodyStart,
                  math.max(0, httpBodyStart - bodyStart), UTF_8)
                val lang = httpHead.linesIterator
                  .find(_.toLowerCase(java.util.Locale.ROOT).startsWith("content-language:"))
                  .map(_.split(":", 2)(1).trim).getOrElse("und")
                if (uri.nonEmpty) {
                  nextPage = Page(uri, ts,
                    java.util.Arrays.copyOfRange(bytes, httpBodyStart, bodyEnd),
                    headers.getOrElse("x-graft-raw-text", ""), lang)
                }
              }
              i = bodyEnd
            }
        }
      }
    }

    advance()
    override def hasNext: Boolean = nextPage != null
    override def next(): Page = {
      val p = nextPage
      advance()
      p
    }
  }

  /** Eager form (tests / small segments). */
  def parseSegment(bytes: Array[Byte]): Seq[Page] =
    parseSegmentIterator(bytes).toSeq

  private[sources] def parseHeaders(s: String): Map[String, String] =
    s.linesIterator.flatMap { line =>
      val idx = line.indexOf(':')
      if (idx > 0) Some(line.substring(0, idx).toLowerCase(java.util.Locale.ROOT)
        -> line.substring(idx + 1).trim)
      else None
    }.toMap

  /** Full-precision (Timestamp.from, not toEpochMilli): the WET writer
    * emits the timestamp's complete instant, so the shared parser must
    * not truncate sub-millisecond digits on the way back. */
  private[sources] def parseDate(s: String): Timestamp =
    try Timestamp.from(Instant.parse(s))
    catch { case _: Exception => new Timestamp(0L) }

  private[sources] def findBytes(b: Array[Byte], p: String, from: Int): Int = {
    val pb = p.getBytes(ISO_8859_1)
    val n = b.length
    var i = math.max(0, from)
    while (i + pb.length <= n) {
      var k = 0
      while (k < pb.length && b(i + k) == pb(k)) k += 1
      if (k == pb.length) return i
      i += 1
    }
    -1
  }

  /** The segment-commit protocol, shared by the WARC and WET writers:
    * write to an underscore-prefixed, attempt-suffixed temp (invisible
    * to Spark's file index AND to a concurrent speculative retry of the
    * same partition), then ATOMIC_MOVE over the target — readers only
    * ever see absent or complete segments, never a torn write. Keep
    * every fix to this discipline HERE so the two writers can't drift. */
  private[sources] def atomicWrite(target: java.nio.file.Path,
                                   bytes: Array[Byte], attemptTag: Long): Unit =
    atomicWriteStream(target, attemptTag)(_.write(bytes))

  /** Streaming form of [[atomicWrite]] (r5 ADVICE #4): the writer
    * callback streams records straight into the temp file, so a
    * ~1 GB segment never has to exist as one in-heap byte array
    * before the atomic move. Same temp-name, move and cleanup
    * semantics as the byte-array form. */
  private[sources] def atomicWriteStream(target: java.nio.file.Path,
                                         attemptTag: Long)
                                        (write: java.io.OutputStream => Unit): Unit = {
    val tmp = target.resolveSibling(
      "_tmp-" + target.getFileName.toString + "." + attemptTag)
    try {
      val os = new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(tmp), 1 << 20)
      try write(os) finally os.close()
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  // ---- Spark surface ------------------------------------------------------

  /** Gunzip a whole segment (CC ships .warc.gz); total — a corrupt
    * stream keeps the already-decompressed prefix (the truncated final
    * record is then skipped by the parser), so one bad byte near the
    * end of a 1 GB segment doesn't drop the whole segment. Initial
    * buffer is clamped so large segments can't overflow Int sizing. */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val initial = math.min(bytes.length.toLong * 4, 64L << 20).toInt
    val out = new java.io.ByteArrayOutputStream(math.max(64, initial))
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), 1 << 16)
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch { case _: java.io.IOException => /* keep the valid prefix */ }
    out.toByteArray
  }

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2)
    val gz = new java.util.zip.GZIPOutputStream(out, 1 << 16)
    gz.write(bytes); gz.close()
    out.toByteArray
  }

  /** Read a directory of .warc / .warc.gz segments into the typed pages
    * Dataset via the built-in binaryFile source (one task per segment —
    * CC segments are ~1 GB, so 100 TB ⇒ ~100k parallel tasks). */
  def readPages(spark: SparkSession, dir: String): Dataset[Page] =
    pagesOf(segmentsDF(spark, dir))

  /** Read a SPECIFIC set of segment files — the file-manifest resume
    * path (ExtractJob.runWarc scans only segments no committed snapshot
    * has consumed, mirroring the parquet path's O(#files) resume). */
  def readPagesFiles(spark: SparkSession, files: Seq[String]): Dataset[Page] = {
    require(files.nonEmpty, "readPagesFiles: empty file list")
    pagesOf(spark.read.format("binaryFile").load(files: _*)
      .select(col("path"), col("content")))
  }

  /** Segment file paths under `dir` as the scan would enumerate them —
    * the unit of resume bookkeeping (manifest `input_files`). */
  def listSegments(spark: SparkSession, dir: String): Seq[String] =
    segmentsDF(spark, dir).inputFiles.toSeq.sorted

  private def segmentsDF(spark: SparkSession, dir: String) =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(dir)
      .select(col("path"), col("content"))

  private def pagesOf(df: org.apache.spark.sql.DataFrame): Dataset[Page] = {
    import df.sparkSession.implicits._
    df.as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val bytes = if (path.endsWith(".gz")) gunzip(content) else content
        parseSegmentIterator(bytes)
      }
  }

  /** Generator-side: write pages as deterministic WARC segments, one
    * file per input partition, written FROM THE EXECUTORS (atomic
    * tmp+rename per segment; nothing rides through driver heap — at a
    * real sf the old collect()-based writer pushed every payload byte
    * through the driver). Local-mode executors share the local FS; a
    * cluster deployment points `dir` at the distributed FS. */
  def writeSegments(pages: Dataset[Page], dir: String, compress: Boolean = false): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // Sweep temps left by a previous crashed run: they are invisible to
    // every reader (the _-prefix), so without this they would accumulate
    // silently, leaking a full segment copy per crash.
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("_tmp-"))
      .foreach(f => java.nio.file.Files.deleteIfExists(f.toPath))
    import pages.sparkSession.implicits._
    val ext = if (compress) ".warc.gz" else ".warc"
    val doGzip = compress
    // returns only O(#partitions) ids to the driver, forcing the write job
    pages.mapPartitions { it =>
      val ps = it.toSeq
      if (ps.isEmpty) Iterator.empty
      else {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        // Common-Crawl layout: with compression, every record is its
        // OWN gzip member (concatenated members are one valid gzip
        // stream — GZIPInputStream reads across member boundaries, so
        // whole-segment gunzip readers are untouched) and the CDX
        // sidecar records each member's (offset, length) so a single
        // record is fetchable by byte range without scanning the
        // segment. Uncompressed segments index plain record ranges.
        val segName = f"segment-$pid%05d$ext"
        // Int-indexed buffer ⇒ a segment is bounded at 2 GB — within
        // the Common-Crawl convention (~1 GB segments) and enforced
        // loudly: ByteArrayOutputStream throws OutOfMemoryError past
        // Int.MaxValue rather than wrapping offsets. Size partitions
        // (repartition upstream) so a partition's records stay under
        // the bound.
        val out = new java.io.ByteArrayOutputStream()
        val cdx = new StringBuilder
        ps.foreach { p =>
          val rec = recordBytes(p)
          val stored = if (doGzip) gzip(rec) else rec
          cdx.append(Warc.cdxKey(p.url)).append('\t').append(segName)
            .append('\t').append(out.size()).append('\t').append(stored.length)
            .append('\t').append(p.warc_ts.getTime).append('\n')
          out.write(stored)
        }
        val bytes = out.toByteArray
        val target = java.nio.file.Paths.get(dir, segName)
        // Underscore prefix: Spark's file index drops _-prefixed files
        // before pathGlobFilter runs, so a crashed writer's temp is
        // invisible to segmentsDF/listSegments. (The *.warc* glob itself
        // WOULD match "_tmp-…" — any non-Spark listing of this dir must
        // keep skipping _* names, as listSegments does.) Attempt-suffixed
        // so a speculative/zombie retry of the same partition never
        // interleaves writes into a live temp; the ATOMIC_MOVE makes
        // last-finisher-wins safe since both attempts carry equal bytes.
        atomicWrite(target, bytes, tc.taskAttemptId())
        // the CDX sidecar commits AFTER its segment (readers treat the
        // index as advisory: segment present + cdx missing = scan path
        // still works; cdx present + segment missing cannot happen)
        val cdxTarget = target.resolveSibling(segName.stripSuffix(ext) + ".cdx")
        atomicWrite(cdxTarget, cdx.toString.getBytes(UTF_8), tc.taskAttemptId())
        Iterator.single(pid)
      }
    }.collect()
    ()
  }

  // ---- CDX random access (the Common-Crawl index pattern) ---------------

  /** The CDX line format separates fields with tabs, and [[headerSafe]]
    * deliberately PRESERVES tabs in WARC headers — so the url field is
    * tab-escaped on write and lookups escape their keys the same way
    * (framing stays 5 fields for any url; fetch-by-offset never depends
    * on the url text). */
  def cdxEscape(url: String): String = url.replace("\t", "%09")

  /** The ONE canonicalization shared by index writes and lookups:
    * [[headerSafe]] first (the writer sanitizes CR/LF/C0 controls out
    * of header values, and the CDX url field rides a header), then
    * [[cdxEscape]]. A lookup that escaped but did not sanitize would
    * silently never find a url containing control chars — the index
    * stores the sanitized form (round-4 ADVICE #4). */
  def cdxKey(url: String): String = cdxEscape(headerSafe(url))

  /** The CDX index of a segment dir: (url, segment, offset, length,
    * warc_ts_ms) — one row per record (urls [[cdxEscape]]d), read from
    * the per-segment sidecars the writer commits. Vastly smaller than
    * the segments (~60 bytes/record vs the payload), so point lookups
    * join against THIS and fetch only the matching byte ranges. */
  def cdxIndex(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    spark.read
      .schema(StructType(Seq(
        StructField("url", StringType), StructField("segment", StringType),
        StructField("offset", LongType), StructField("length", IntegerType),
        StructField("warc_ts_ms", LongType))))
      .option("sep", "\t")
      .option("pathGlobFilter", "*.cdx")
      .csv(dir)
  }

  /** Point-fetch ONE record by CDX coordinates: reads `length` bytes at
    * `offset` (a complete gzip member for .gz segments), never the
    * segment. The raw-crawl analog of the reference's per-document S3
    * GET (ocrworker/s3.py) — S4 point lookup at the segment layer. */
  def fetchRecord(dir: String, segment: String, offset: Long, length: Int): Option[Page] = {
    val ch = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(dir, segment))
    try {
      val buf = java.nio.ByteBuffer.allocate(length)
      ch.position(offset)
      while (buf.hasRemaining && ch.read(buf) >= 0) {}
      val raw = buf.array()
      val bytes = if (segment.endsWith(".gz")) gunzip(raw) else raw
      val it = parseSegmentIterator(bytes)
      if (it.hasNext) Some(it.next()) else None
    } finally ch.close()
  }

  /** Batch point lookups: broadcast-join the url set against the CDX
    * index and fetch ONLY the matching byte ranges, executor-side (the
    * same local-FS visibility contract as [[writeSegments]]). Each
    * partition's rows are grouped by segment so one FileChannel serves
    * every record in that segment — O(#segments) opens, not
    * O(#records), on exactly the path this feature makes cheap. */
  def lookupPages(spark: SparkSession, dir: String, urls: Seq[String]): Dataset[Page] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    cdxIndex(spark, dir)
      .join(broadcast(urls.map(cdxKey).toDF("url")), Seq("url"), "left_semi")
      .select(col("segment"), col("offset"), col("length"))
      .as[(String, Long, Int)]
      .mapPartitions { it =>
        it.toSeq.groupBy(_._1).iterator.flatMap { case (seg, rows) =>
          val ch = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(dir, seg))
          try {
            rows.sortBy(_._2).flatMap { case (_, off, len) =>
              val buf = java.nio.ByteBuffer.allocate(len)
              ch.position(off)
              while (buf.hasRemaining && ch.read(buf) >= 0) {}
              val raw = buf.array()
              val bytes = if (seg.endsWith(".gz")) gunzip(raw) else raw
              val pit = parseSegmentIterator(bytes)
              if (pit.hasNext) Some(pit.next()) else None
            }
          } finally ch.close()
        }
      }
  }
}
