package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.job.ExtractJob

/** Streaming mode of the engine — the direct analog of the reference's
  * arrival-driven worker (Celery consumes one message per document,
  * /root/reference/ocrworker/celery_app.py:10-19): a file source
  * watches the pages table directory, each micro-batch runs the SAME
  * extraction pipeline via foreachBatch, and commits the same
  * Iceberg-style snapshots — so batch resume and streaming checkpoints
  * compose (a batch run can take over from a streaming run and vice
  * versa, because both bookkeep over committed input files).
  *
  * Also provides the event-time path the reference lacks (it has no
  * watermarks — SURVEY.md §2.10): windowed per-host throughput metrics
  * over warc_ts with a configurable watermark.
  */
object StreamingExtract {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Streaming extraction: every micro-batch of newly-arrived page files
    * is extracted and committed as a snapshot. maxFilesPerTrigger bounds
    * per-batch work (the analog of queue prefetch). */
  def extractStream(spark: SparkSession, pagesDir: String, outRoot: String,
                    checkpoint: String, maxFilesPerTrigger: Int = 8): DataStreamWriter[Row] = {
    val stream = spark.readStream
      .schema(pageSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(pagesDir)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // reuse the batch pipeline's snapshot commit; the batch df is
        // already the newly-seen rows, so file bookkeeping defers to
        // the streaming checkpoint, and row-level resume stays on as
        // the safety net for overlap after a crash between the two
        // bookkeeping layers.
        import batch.sparkSession.implicits._
        val pages = batch.as[graft.core.Page]
        val extracted = ExtractJob.extractDS(pages)
        ExtractJob.appendSnapshot(extracted, outRoot)
        ()
      }
  }

  /** Arbitrary stateful streaming: cumulative per-host document counts
    * maintained across micro-batches via
    * KeyValueGroupedDataset.mapGroupsWithState — the custom-state form
    * of the reference's long-lived per-queue progress counters
    * (/root/reference/ocrworker/segmentation_tasks.py:293-332 job
    * status updates). Output mode: Update (one refreshed row per host
    * per batch). */
  def statefulHostCounts(pages: DataFrame): org.apache.spark.sql.Dataset[(String, Long)] = {
    import pages.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    pages.select(graft.ops.Hosts.hostOf(col("url")).as[String])
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (host: String, rows: Iterator[String], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (host, n)
      }
  }

  /** Event-time metrics: tumbling-window per-host doc counts with a
    * watermark on warc_ts (late data beyond the watermark dropped —
    * the streaming analog of the reference's bounded retry window,
    * /root/reference/ocrworker/tasks.py:23-28). */
  def hostThroughput(pages: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    pages
      .withWatermark("warc_ts", watermark)
      .groupBy(
        window(col("warc_ts"), window_),
        graft.ops.Hosts.hostOf(col("url")).as("host"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("window.start").as("window_start"), col("host"), col("n_docs"))
  }

  /** Streaming exact dedup: keep one arrival per content hash, dropping
    * re-crawls/mirrors across micro-batches — the streaming form of the
    * batch exact dedup (q12's md5 groupBy). State is bounded by the
    * watermark: dropDuplicatesWithinWatermark evicts a hash once the
    * event-time watermark passes it, so the state store holds only the
    * in-window tail — plain dropDuplicates state grows with every
    * distinct document ever seen and would OOM a 10^12-row stream.
    * The trade is explicit: a re-crawl arriving later than
    * `watermarkDelay` after the original is re-emitted (downstream
    * batch dedup remains the safety net, same layering as resume). */
  def dedupStream(pages: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    pages.withColumn("content_hash", md5(col("html")))
      .withWatermark("warc_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** One in-flight session per user: [start, end] in epoch MICROS plus
    * its event count. Micros (not ms) because TimestampType carries
    * microsecond precision and the emitted session bounds must round-trip
    * bit-exactly against the batch min/max(ts). */
  final case class OpenSession(startUs: Long, endUs: Long, n: Int)

  /** Streaming gap-sessionization (the q16 batch rule as a stream):
    * flatMapGroupsWithState with an EVENT-TIME timeout — a session
    * CLOSES and is emitted exactly once, either because a same-user
    * event arrives > gap after it, or because the watermark passes
    * the last instant a mergeable event could exist (the timeout
    * path). The gap rule is EXACTLY q16's: truncated-to-second epoch
    * difference strictly greater than gap seconds — so streaming and
    * batch sessionization agree row-for-row, including on
    * microsecond-precision timestamps. State per user is ONE
    * OpenSession row — bounded regardless of stream length, unlike
    * collecting events per user. Within a trigger, a user's events are
    * sorted by event time, so multi-session batches close intermediate
    * sessions immediately. Timeout timestamps are clamped above the
    * current watermark (a session that was already expired when its
    * user's first post-gap batch arrives still closes on the NEXT
    * trigger rather than throwing). Contract: event-time-ordered
    * delivery per user within the watermark; data later than the
    * watermark is the caller's loss, same as every watermarked
    * operator here. */
  def sessionsStream(events: DataFrame, gapMinutes: Int = 30,
                     watermark: String = "1 hour"):
      org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp, java.sql.Timestamp, Int)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapSec = gapMinutes * 60L
    // local defs only: the state closure must not capture this object
    // (Task not serializable otherwise)
    def secOf(us: Long): Long = Math.floorDiv(us, 1000000L)
    // full-precision epoch micros (getTime alone drops the
    // sub-millisecond fraction; nanos carries it)
    def microsOf(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    def tsOf(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    def emit(user: Long, s: OpenSession) = (user, tsOf(s.startUs), tsOf(s.endUs), s.n)
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(user, s))
          } else {
            val times = rows.map(r => microsOf(r._2)).toArray.sorted
            var closed = List.empty[(Long, java.sql.Timestamp, java.sql.Timestamp, Int)]
            var cur = state.getOption.orNull
            var i = 0
            while (i < times.length) {
              val t = times(i)
              if (cur == null) cur = OpenSession(t, t, 1)
              else if (secOf(t) - secOf(cur.endUs) > gapSec) {
                closed = emit(user, cur) :: closed
                cur = OpenSession(t, t, 1)
              } else cur = OpenSession(math.min(cur.startUs, t),
                math.max(cur.endUs, t), cur.n + 1)
              i += 1
            }
            state.update(cur)
            // latest mergeable instant: any t with sec(t) <= sec(end)+gap,
            // i.e. strictly below (sec(end)+gap+1) seconds. Timeout at that
            // boundary (ms) — and above the current watermark, or Spark throws.
            state.setTimeoutTimestamp(math.max(
              (secOf(cur.endUs) + gapSec + 1) * 1000L,
              state.getCurrentWatermarkMs() + 1))
            closed.reverseIterator
          }
        })
  }
}
