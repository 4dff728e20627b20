package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.{Dataset, SparkSession}

/** WET sidecar — Common Crawl's extracted-text distribution format:
  * a WARC container of `WARC-Type: conversion` records whose body is
  * the plain UTF-8 extracted text of one page. With q48's raw WARC
  * segments (payload archive) and q98's WAT metadata records, this
  * completes the WARC/WAT/WET artifact triple a crawl pipeline
  * publishes (the reference's analog is the extracted-text record it
  * commits per document version, `ocrworker/tasks.py`).
  *
  * Same segment discipline as [[Warc.writeSegments]] — the commit
  * protocol itself is the SHARED [[Warc.atomicWrite]], so a fix there
  * covers both writers. WET carries no CDX sidecar (matching the
  * Common Crawl convention — text consumers scan; random access goes
  * through the WARC's index) but does commit a `_WET_DONE` marker
  * AFTER the last segment lands: the marker is the emission's commit
  * record (readers of a marker-less dir may be looking at a crashed,
  * partial emission) and carries the record count for audit.
  *
  * Roundtrip contract (q100): writer → gzip → parser preserves every
  * url, language tag, timestamp millisecond and text BYTE — the DuckDB
  * oracle aggregates the same subset straight from the extraction dump
  * and the sums (including an md5-slice text key) must match exactly.
  */
object Wet {

  /** Bump to invalidate fixture dirs derived from this writer/parser. */
  val Version = 1

  /** Completion marker: present ⇔ an emission into the dir ran to the
    * end; its body is the record count written. */
  val DoneMarker = "_WET_DONE"

  final case class WetRecord(url: String, warc_ts: Timestamp,
                             lang: String, text: String)

  private val warcDate = DateTimeFormatter.ISO_INSTANT

  private def headerSafe(s: String): String = {
    val v = Option(s).getOrElse("")
    val sb = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c != '\r' && c != '\n' && c >= ' ') sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** One conversion record. The body is the raw UTF-8 text (newlines
    * included verbatim — Content-Length delimits, nothing escapes). */
  def recordBytes(r: WetRecord): Array[Byte] = {
    val body = Option(r.text).getOrElse("").getBytes(UTF_8)
    val head = ("WARC/1.0\r\n" +
      "WARC-Type: conversion\r\n" +
      s"WARC-Target-URI: ${headerSafe(r.url)}\r\n" +
      s"WARC-Date: ${warcDate.format(r.warc_ts.toInstant)}\r\n" +
      s"WARC-Identified-Content-Language: ${headerSafe(r.lang)}\r\n" +
      "Content-Type: text/plain\r\n" +
      s"Content-Length: ${body.length}\r\n" +
      "\r\n").getBytes(UTF_8)
    val out = new Array[Byte](head.length + body.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** True iff `dir` holds a COMPLETE emission (its [[DoneMarker]]
    * committed). A dir with segments but no marker is a crashed,
    * possibly partial emission — safe to re-emit over. */
  def isComplete(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, DoneMarker))

  /** Write records as WET segments, one per partition (the
    * [[Warc.atomicWrite]] discipline: per-record gzip members,
    * invisible temps, atomic move, O(#partitions) driver traffic).
    * Entry SWEEPS any pre-existing segments and the marker — a
    * re-emission with fewer partitions must not leave stale
    * higher-numbered segments for readers to merge in — and exit
    * commits the [[DoneMarker]]. Returns the record count written. */
  def writeSegments(recs: Dataset[WetRecord], dir: String,
                    compress: Boolean = false): Long = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("_tmp-") ||
        f.getName.startsWith("segment-") || f.getName == DoneMarker)
      .foreach(f => java.nio.file.Files.deleteIfExists(f.toPath))
    import recs.sparkSession.implicits._
    val ext = if (compress) ".warc.wet.gz" else ".warc.wet"
    val doGzip = compress
    val counts = recs.mapPartitions { it =>
      // r5 ADVICE #4: records stream one at a time into the temp file
      // (gzip member per record, same byte layout) instead of first
      // materializing the whole partition (it.toSeq) AND the whole
      // segment (ByteArrayOutputStream) — ~2x the segment no longer
      // sits in executor heap per task at CC-scale segment sizes.
      if (!it.hasNext) Iterator.empty
      else {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val segName = f"segment-$pid%05d$ext"
        var n = 0L
        Warc.atomicWriteStream(java.nio.file.Paths.get(dir, segName),
          tc.taskAttemptId()) { out =>
          it.foreach { r =>
            val rec = recordBytes(r)
            out.write(if (doGzip) Warc.gzip(rec) else rec)
            n += 1
          }
        }
        Iterator.single(n)
      }
    }.collect()
    val n = counts.sum
    // marker last: its presence certifies every segment above landed
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, DoneMarker), s"$n\n".getBytes(UTF_8))
    n
  }

  /** Parse one (possibly multi-member-gzipped) WET segment. */
  def parseSegment(bytes: Array[Byte]): Seq[WetRecord] = {
    val raw = if (bytes.length >= 2 &&
      (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B)
      Warc.gunzip(bytes) else bytes
    val out = scala.collection.mutable.ArrayBuffer.empty[WetRecord]
    var i = 0
    val n = raw.length
    while (i < n) {
      val start = Warc.findBytes(raw, "WARC/", i)
      if (start < 0) { i = n }
      else {
        val headEnd = Warc.findBytes(raw, "\r\n\r\n", start)
        if (headEnd < 0) { i = n }
        else {
          val headers =
            Warc.parseHeaders(new String(raw, start, headEnd - start, UTF_8))
          val bodyStart = headEnd + 4
          headers.get("content-length").flatMap(_.toIntOption) match {
            // `len <= n - bodyStart`, NOT `bodyStart + len <= n`: a
            // corrupt length near 2^31 wraps the sum negative and would
            // sneak past the bound, crashing the String ctor instead of
            // resyncing like every other malformed record.
            case Some(len) if len >= 0 && len <= n - bodyStart =>
              if (headers.getOrElse("warc-type", "") == "conversion") {
                val uri = headers.getOrElse("warc-target-uri", "")
                val ts = Warc.parseDate(headers.getOrElse("warc-date", ""))
                val lang = headers.getOrElse("warc-identified-content-language", "")
                out += WetRecord(uri, ts, lang,
                  new String(raw, bodyStart, len, UTF_8))
              }
              i = bodyStart + len
            case _ => i = bodyStart // malformed length: resync on next WARC/
          }
        }
      }
    }
    out.toSeq
  }

  /** Read a directory of .warc.wet / .warc.wet.gz segments into a typed
    * Dataset — one task per segment file, parse map-side (the Warc
    * reader's scan shape: at Common-Crawl scale each ~1 GB segment is
    * one input split; nothing shuffles). */
  def readRecords(spark: SparkSession, dir: String): Dataset[WetRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.wet*")
      .load(dir)
      .select("content").as[Array[Byte]]
      .flatMap(parseSegment _)
  }
}
