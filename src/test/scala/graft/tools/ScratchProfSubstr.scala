package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B: char-offset substring (O(p) UTF-8 scan per window)
  * vs byte-slice substring over an ASCII-guarded binary column (O(1))
  * for the strided/rolling window hash extractors (spanHashes,
  * winnowedFingerprints grams, cdc1 boundaries).
  */
object ScratchProfSubstr {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        t
      }
      println(f"PROF $label%-40s ${ts.sorted.apply(1)}%8.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    val docs = graft.Tables.documentsParallel(spark, dir)

    // --- strided 32-char windows, md5 (spanHashes shape) ---
    val W = 32; val S = 8
    def charWins(d: DataFrame): DataFrame = d
      .where(col("n_chars") >= W)
      .select(col("doc_id"),
        explode(sequence(lit(1L), col("n_chars") - (W - 1), lit(S.toLong))).as("p"),
        col("text"))
      .select(col("doc_id"), col("p"),
        md5(expr(s"substring(text, CAST(p AS INT), $W)")).as("h"))
    def byteWins(d: DataFrame): DataFrame = d
      .where(col("n_chars") >= W)
      .select(col("doc_id"),
        when(length(col("text")) === octet_length(col("text")),
          col("text").cast("binary")).as("__bin"),
        explode(sequence(lit(1L), col("n_chars") - (W - 1), lit(S.toLong))).as("p"),
        col("text"))
      .select(col("doc_id"), col("p"),
        md5(coalesce(
          expr(s"substring(__bin, CAST(p AS INT), $W)"),
          expr(s"substring(text, CAST(p AS INT), $W)").cast("binary"))).as("h"))
    time("spanHashes char (x2 consumers)") { sink(charWins(docs)); sink(charWins(docs)) }
    time("spanHashes byte (x2 consumers)") { sink(byteWins(docs)); sink(byteWins(docs)) }
    // equality
    val a = charWins(docs).collect().map(_.toString).sorted
    val b = byteWins(docs).collect().map(_.toString).sorted
    println(s"EQUAL span char-vs-byte: ${a.sameElements(b)} (${a.length} rows)")

    // --- rolling 8-grams, portableHash60 (winnowedFingerprints shape) ---
    val K = 8
    def charGrams(d: DataFrame): DataFrame = d
      .where(col("n_chars") >= K)
      .select(col("doc_id"),
        explode(sequence(lit(1L), col("n_chars") - (K - 1))).as("p"), col("text"))
      .select(col("doc_id"), col("p"),
        (Dedup.portableHash60(
          expr(s"substring(text, CAST(p AS INT), $K)")) % 1099511627776L).as("h"))
    def byteGrams(d: DataFrame): DataFrame = d
      .where(col("n_chars") >= K)
      .select(col("doc_id"),
        when(length(col("text")) === octet_length(col("text")),
          col("text").cast("binary")).as("__bin"),
        explode(sequence(lit(1L), col("n_chars") - (K - 1))).as("p"), col("text"))
      .select(col("doc_id"), col("p"),
        (Dedup.portableHash60(coalesce(
          expr(s"substring(__bin, CAST(p AS INT), $K)"),
          expr(s"substring(text, CAST(p AS INT), $K)").cast("binary")))
          % 1099511627776L).as("h"))
    time("grams char") { sink(charGrams(docs)) }
    time("grams byte") { sink(byteGrams(docs)) }
    val c = charGrams(docs).collect().map(_.toString).sorted
    val d2 = byteGrams(docs).collect().map(_.toString).sorted
    println(s"EQUAL grams char-vs-byte: ${c.sameElements(d2)} (${c.length} rows)")
    spark.stop()
  }
}
