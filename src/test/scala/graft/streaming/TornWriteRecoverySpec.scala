package graft.streaming

import graft.SparkSpec
import graft.energy.AtomicLayer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Mid-batch crash recovery (VERDICT r13 #3): the prior restart proofs
  * kill BETWEEN micro-batches; the harder contract is a kill DURING a
  * foreachBatch AtomicLayer write. The crash leaves a torn snapshot —
  * an uncommitted `v<n>` directory (no `_SUCCESS`) plus its claim file
  * — and the contract is three-legged:
  *   1. the torn snapshot is INVISIBLE to readers and to the
  *      `lastMergedBatch` guard (the batch never committed);
  *   2. the engine's restart redelivers the batch and the replayed
  *      merge RE-RUNS (contrast: a batch that committed before the
  *      crash replays as a no-op — the `_merged_batch_id` guard);
  *   3. a vacuum pass collects the crashed batch's debris once the
  *      claim lease expires, without touching committed snapshots.
  * The crash is injected for real: a udf in the batch projection throws
  * inside the write JOB, after the committer has created the version
  * directory — the exact torn state a killed executor/driver leaves.
  */
class TornWriteRecoverySpec extends SparkSpec {
  import spark.implicits._

  private val boom = udf((v: Double) =>
    if (v >= Double.MinValue) throw new RuntimeException("injected mid-write crash")
    else v)

  private def uncommittedDirs(root: String): Seq[String] = {
    val d = new java.io.File(root)
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .filterNot(f => new java.io.File(f, "_SUCCESS").exists())
      .map(_.getName)
  }
  private def claims(root: String): Seq[String] = {
    val d = new java.io.File(root)
    Option(d.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && f.getName.matches("v\\d+\\.claim"))
      .map(_.getName)
  }
  private def expireClaims(root: String): Unit =
    claims(root).foreach { c =>
      new java.io.File(root, c).setLastModified(
        System.currentTimeMillis() - 10L * 60 * 1000): Unit
    }

  /** The in-JVM crash above exercises the SOFT-failure torn state: the
    * job aborts, Spark's committer deletes the half-written version dir,
    * and only the claim survives (verified by the probe run this spec
    * was built against). A HARD kill (SIGKILL / node loss) skips
    * abortJob and leaves the version dir with stray task files and no
    * `_SUCCESS` — a test cannot SIGKILL its own JVM, so that residue is
    * manufactured here exactly as the committer would have left it:
    * the claimed version's dir with an orphan part file and no marker.
    */
  private def simulateHardKillResidue(root: String): Unit =
    claims(root).foreach { c =>
      val dir = new java.io.File(root, c.stripSuffix(".claim"))
      if (!dir.exists()) {
        assert(dir.mkdirs())
        java.nio.file.Files.write(
          dir.toPath.resolve("part-00000-deadbeef-c000.snappy.parquet"),
          Array[Byte](0x50, 0x41, 0x52, 0x31)): Unit // stray "PAR1" stub
      }
    }

  test("st13 shape: a gold refresh killed mid-write is invisible, the restart supersedes it, vacuum sweeps it") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = graft.tools.Scratch.dir("torn-gold-ckpt").toString
    val root = graft.tools.Scratch.dir("torn-gold").toString + "/gold.parquet"
    val input = MemoryStream[(String, Double)]
    @volatile var poison = true
    def start() = input.toDF().toDF("event_type", "value")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .writeStream
      .outputMode("complete") // st13's shape: stream owns the aggregate,
      .option("checkpointLocation", ckpt) // foreachBatch lands snapshots
      .foreachBatch { (b: DataFrame, id: Long) =>
        val snap =
          if (id >= 1 && poison) b.withColumn("total", boom(col("total")))
          else b
        AtomicLayer.write(snap, root): Unit
      }
      .start()

    // batch 0 commits v0
    val q1 = start()
    try { input.addData(("click", 1.0), ("view", 2.0)); q1.processAllAvailable() }
    finally q1.stop()
    val v0 = AtomicLayer.read(spark, root)
      .orderBy("event_type").collect().toSeq

    // batch 1 crashes INSIDE the snapshot write
    input.addData(("click", 4.0))
    val q2 = start()
    val crash = intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    assert(crash.getMessage != null)

    // leg 1: torn snapshot invisible — readers still see v0 exactly
    assert(claims(root).nonEmpty, "crash must leave the claim file")
    simulateHardKillResidue(root) // upgrade to the SIGKILL-shaped residue
    assert(uncommittedDirs(root).nonEmpty, "hard kill leaves a torn v<n>")
    assert(AtomicLayer.read(spark, root).orderBy("event_type").collect().toSeq
      == v0, "a torn snapshot leaked to readers")

    // leg 2: restart from the checkpoint redelivers batch 1; the fresh
    // complete-mode snapshot must equal the aggregate of ALL input
    poison = false
    val q3 = start()
    try q3.processAllAvailable()
    finally q3.stop()
    val got = AtomicLayer.read(spark, root)
      .select(col("event_type"), col("n"), col("total"))
      .orderBy("event_type").collect().toSeq
    val want = Seq(("click", 1.0), ("view", 2.0), ("click", 4.0))
      .toDF("event_type", "value")
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("value").as("total"))
      .orderBy("event_type").collect().toSeq
    assert(got == want, s"restart did not supersede the torn write: $got vs $want")

    // leg 3: vacuum collects the crashed batch's debris (expired lease),
    // keeps the committed snapshot readable
    expireClaims(root)
    val stats = AtomicLayer.vacuum(spark, root, keepVersions = 1, claimLeaseMs = 1)
    assert(stats.sweptUncommittedDirs >= 1, s"vacuum left the torn dir: $stats")
    assert(stats.sweptClaims >= 1, s"vacuum left the claim: $stats")
    assert(uncommittedDirs(root).isEmpty && claims(root).isEmpty)
    assert(AtomicLayer.read(spark, root)
      .select(col("event_type"), col("n"), col("total"))
      .orderBy("event_type").collect().toSeq == want)
  }

  test("st25 shape: an SCD-2 merge killed mid-write re-merges on redelivery; a committed batch replays as a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = graft.tools.Scratch.dir("torn-scd2-ckpt").toString
    val root = graft.tools.Scratch.dir("torn-scd2").toString + "/dim.parquet"
    // (user_id, event_id, ts_sec, value) signup changes
    val input = MemoryStream[(Long, Long, Long, Double)]
    @volatile var poison = true
    def start() = input.toDF().toDF("user_id", "event_id", "ts_sec", "value")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        val src =
          if (id >= 1 && poison) b.withColumn("value", boom(col("value")))
          else b
        EventsStream.mergeScd2(spark, root, src, id): Unit
      }
      .start()

    val batch0 = Seq((1L, 10L, 100L, 1.0), (2L, 11L, 110L, 2.0))
    val batch1 = Seq((1L, 12L, 200L, 3.0), (3L, 13L, 210L, 4.0))

    val q1 = start()
    try { input.addData(batch0: _*); q1.processAllAvailable() } finally q1.stop()
    assert(AtomicLayer.lastMergedBatch(spark, root) == 0L)

    // batch 1 crashes INSIDE the merge's snapshot write
    input.addData(batch1: _*)
    val q2 = start()
    intercept[Exception] { q2.processAllAvailable() }
    q2.stop()

    // leg 1: the torn snapshot never committed — the guard still says 0,
    // so the redelivered batch MUST re-merge (not no-op)
    assert(claims(root).nonEmpty, "crash must leave the claim file")
    simulateHardKillResidue(root) // upgrade to the SIGKILL-shaped residue
    assert(uncommittedDirs(root).nonEmpty)
    assert(AtomicLayer.lastMergedBatch(spark, root) == 0L,
      "a torn write must not advance the merged-batch guard")

    // leg 2: restart redelivers batch 1; converged dim equals the
    // one-shot batch history over all events
    poison = false
    val q3 = start()
    try q3.processAllAvailable()
    finally q3.stop()
    assert(AtomicLayer.lastMergedBatch(spark, root) == 1L)
    val got = AtomicLayer.read(spark, root).drop("_merged_batch_id")
      .select("user_id", "version", "event_id", "value",
        "effective_from", "effective_to", "is_current")
      .orderBy("user_id", "version").collect().toSeq
    val want = graft.operators.Scd2.buildHistory(
        (batch0 ++ batch1).toDF("user_id", "event_id", "ts_sec", "value"),
        col("user_id"), col("ts_sec"), col("event_id"))
      .select("user_id", "version", "event_id", "value",
        "effective_from", "effective_to", "is_current")
      .orderBy("user_id", "version").collect().toSeq
    assert(got == want, s"redelivered merge diverged from the batch history")

    // contrast leg: a batch that DID commit replays as a no-op — the
    // crash-after-commit-before-offset case
    assert(!EventsStream.mergeScd2(spark, root,
        batch1.toDF("user_id", "event_id", "ts_sec", "value"), 1L),
      "a committed batch id must replay as a merge no-op")

    // leg 3: vacuum collects the torn debris, committed dim unchanged
    expireClaims(root)
    val stats = AtomicLayer.vacuum(spark, root, keepVersions = 1, claimLeaseMs = 1)
    assert(stats.sweptUncommittedDirs >= 1 && stats.sweptClaims >= 1, s"$stats")
    assert(AtomicLayer.read(spark, root).drop("_merged_batch_id")
      .select("user_id", "version", "event_id", "value",
        "effective_from", "effective_to", "is_current")
      .orderBy("user_id", "version").collect().toSeq == want)
  }
}
