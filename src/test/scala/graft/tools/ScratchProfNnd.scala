package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway A/B profiler for the r16 descentRounds dedup fold: times
  * the old shape (window prune + settled-edge anti-join), the new shape
  * (in-heap dedup prune, no anti-join), and the hybrid (dedup prune +
  * anti-join kept) in ONE JVM so JIT/cache state is shared.
  */
object ScratchProfNnd {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.scale/sf1.0")
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
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        t
      }
      println(f"PROF $label%-36s ${ts.sorted.apply(1)}%8.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    val c = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val graphK = 5
    val rounds = 2

    def seeds() = Similarity.scorePairs(c,
      Similarity.hashSeedPairs(c, 16, 2, 64))

    // OLD shape: row_number window prune + settled-edge anti-join
    def oldDescent(): DataFrame = {
      val w = Window.partitionBy("v").orderBy(col("cosine").desc, col("u"))
      def prune(g: DataFrame): DataFrame = g
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= graphK)
      var graph = prune(seeds()).select("v", "u", "cosine")
        .localCheckpoint(eager = false)
      for (_ <- 1 to rounds) {
        val und = graph.select("v", "u")
          .unionByName(graph.select(col("u").as("v"), col("v").as("u")))
          .distinct()
        val cand = und.alias("a").join(und.alias("b"), col("a.u") === col("b.v"))
          .where(col("a.v") =!= col("b.u"))
          .select(col("a.v").as("v"), col("b.u").as("u"))
          .distinct()
          .join(graph.select("v", "u"), Seq("v", "u"), "left_anti")
        graph = prune(graph.unionByName(Similarity.scorePairs(c, cand)))
          .select("v", "u", "cosine").localCheckpoint(eager = false)
      }
      prune(graph).select(col("v"), col("rank"), col("u").as("nbr"), col("cosine"))
    }

    // HYBRID: dedup-heap prune + anti-join kept
    def hybridDescent(): DataFrame = {
      def prune(g: DataFrame, rank: Boolean = false): DataFrame =
        graft.plans.TopKPerKey.topKPerKey(
          g, Seq("v"), Seq("cosine" -> false, "u" -> true), graphK,
          dedupCols = Seq("u"), rankCol = if (rank) Some("rank") else None)
      var graph = prune(seeds()).select("v", "u", "cosine")
        .localCheckpoint(eager = false)
      for (_ <- 1 to rounds) {
        val und = graph.select("v", "u")
          .unionByName(graph.select(col("u").as("v"), col("v").as("u")))
          .distinct()
        val cand = und.alias("a").join(und.alias("b"), col("a.u") === col("b.v"))
          .where(col("a.v") =!= col("b.u"))
          .select(col("a.v").as("v"), col("b.u").as("u"))
          .distinct()
          .join(graph.select("v", "u"), Seq("v", "u"), "left_anti")
        graph = prune(graph.unionByName(Similarity.scorePairs(c, cand)))
          .select("v", "u", "cosine").localCheckpoint(eager = false)
      }
      prune(graph, rank = true)
        .select(col("v"), col("rank"), col("u").as("nbr"), col("cosine"))
    }

    // NEW shape as shipped
    def newDescent(): DataFrame =
      Similarity.descentRounds(c, seeds(), graphK, rounds)

    time("A old: window prune + anti-join") { sink(oldDescent()) }
    time("B hybrid: dedup prune + anti-join") { sink(hybridDescent()) }
    time("C new: dedup prune, no anti-join") { sink(newDescent()) }

    // equality census: new vs old must be row-identical
    val a = oldDescent().collect().map(_.toString).sorted
    val cnew = newDescent().collect().map(_.toString).sorted
    println(s"EQUAL old-vs-new: ${a.sameElements(cnew)} (${a.length} rows)")
    spark.stop()
  }
}
