package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional third arg: regex over query names (dev-loop filter; the
    // driver always runs the full set).
    val Array(sfDir, outDir) = args.take(2)
    val nameFilter = args.lift(2).map(_.r)
    def selected(name: String): Boolean =
      nameFilter.forall(_.findFirstIn(name).isDefined)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // one codegen'd fragment set per registry query — see Bench.scala's
      // codegen-cache note (the 100-entry default thrashes at 423 queries)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // FRESH-OUTDIR GUARD: an UNFILTERED run owns the whole directory —
    // remove subdirectories for queries that no longer exist (renames /
    // removals), so a later sweep never compares against stale debris
    // from an earlier registry. Filtered dev runs leave siblings alone.
    // Only directories that are recognizably OUR dumps are touched
    // (ADVICE r11: a mispointed outDir must not destroy unrelated
    // trees): a dump Verify wrote has a `_SUCCESS` marker or
    // `part-*.parquet` files at its top level.
    if (nameFilter.isEmpty) {
      val live = SparkEntry.queries.keySet
      def isDump(d: java.io.File): Boolean =
        Option(d.listFiles()).getOrElse(Array.empty).exists(f =>
          f.getName == "_SUCCESS" ||
            (f.getName.startsWith("part-") && f.getName.contains(".parquet")))
      Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && !live.contains(f.getName))
        .foreach { stale =>
          if (isDump(stale)) {
            System.err.println(s"[verify] removing stale dump: ${stale.getName}")
            def rm(f: java.io.File): Unit = {
              Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
              f.delete(): Unit
            }
            rm(stale)
          } else {
            System.err.println(
              s"[verify] leaving non-dump directory alone: ${stale.getName}")
          }
        }
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // The names THIS run was responsible for — check_oracle.py uses it to
    // ignore (and flag) any other directory as stale debris. Written on
    // UNFILTERED runs only (matching the stale-purge guard, ADVICE r11):
    // a filtered dev run rewriting the manifest would shrink a later
    // full-directory sweep to the filtered subset while still passing.
    if (nameFilter.isEmpty)
      Files.writeString(Paths.get(s"$outDir/query_names.json"),
        SparkEntry.queries.keys.toSeq.sorted
          .map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
