package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Throwaway stage profiler (not part of the driver contract).
  * Currently instrumented for d11_containment_join's stages — the most
  * expensive registry query at sf1.0 (r8 scaling curve).
  */
object ScratchProf {
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val threshold = 0.8 // d11's setting
    val docs = Tables.documentsParallel(spark, dir)
    val toks = time("toks build+checkpoint") {
      val t = Dedup.shingleRows(docs, 3)
        .select(col("doc_id"), col("shingle").as("term")).distinct()
        .localCheckpoint()
      println("  rows=" + t.count()); t
    }
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val df = toks.groupBy("term").agg(count(lit(1)).as("df"))
    val prefixLen = (col("n_tok") -
      ceil(lit(threshold) * col("n_tok")).cast("long") + 1).cast("int")
    val prefix = time("prefix build+checkpoint") {
      val p = toks
        .join(df, Seq("term"))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("term")))).as("ts"),
          count(lit(1)).as("n_tok"))
        .select(col("doc_id"), col("n_tok"),
          explode(slice(col("ts"), lit(1), prefixLen)).as("t"))
        .select(col("doc_id"), col("n_tok"), col("t.term").as("term"))
        .localCheckpoint()
      println("  rows=" + p.count()); p
    }
    val full = toks.join(sizes, Seq("doc_id"))
    val cand = time("cand join+distinct+ckpt") {
      val c = prefix.as("a")
        .join(full.as("b"),
          col("a.term") === col("b.term") && col("a.doc_id") =!= col("b.doc_id") &&
            col("b.n_tok") >= ceil(lit(threshold) * col("a.n_tok")))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .localCheckpoint()
      println("  rows=" + c.count()); c
    }
    val inter = cand
      .join(toks.select(col("doc_id").as("doc_a"), col("term")), Seq("doc_a"))
      .join(toks.select(col("doc_id").as("doc_b"), col("term")), Seq("doc_b", "term"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    val res = time("verify join+agg") {
      val cont = col("n_inter").cast(DoubleType) / col("n_a").cast(DoubleType)
      val r = inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_tok").as("n_a")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("n_tok").as("n_b")), Seq("doc_b"))
        .where(cont >= threshold)
      println("  rows=" + r.count()); r
    }
    res.unpersist()

    // hypothesis: array-based verify (reuse per-doc sorted term arrays,
    // size(array_intersect)) beats re-shuffling toks twice + groupBy
    val byDoc = time("byDoc arrays build+ckpt") {
      val b = toks.groupBy("doc_id")
        .agg(sort_array(collect_list(col("term"))).as("terms"),
          count(lit(1)).as("n_tok"))
        .localCheckpoint()
      println("  rows=" + b.count()); b
    }
    val res2 = time("verify via array_intersect") {
      val cont2 = col("n_inter").cast(DoubleType) / col("n_a").cast(DoubleType)
      val r = cand
        .join(byDoc.select(col("doc_id").as("doc_a"),
          col("terms").as("ta"), col("n_tok").as("n_a")), Seq("doc_a"))
        .join(byDoc.select(col("doc_id").as("doc_b"),
          col("terms").as("tb"), col("n_tok").as("n_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("ta"), col("tb"))).cast("long").as("n_inter"),
          col("n_a"), col("n_b"))
        .where(cont2 >= threshold)
      println("  rows=" + r.count()); r
    }
    res2.unpersist()
    spark.stop()
  }
}
