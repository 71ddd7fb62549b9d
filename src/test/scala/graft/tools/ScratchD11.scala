package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only d11 stage profiler: times each stage of the containment
  * join at the SF dir in SPARK_GRAFT_SF_DIR so the sf3 cost can be
  * attributed (shingle+distinct / df+arrays / candidate join / verify).
  */
object ScratchD11 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/.scale/sf3.0")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.Tables.documentsParallel(spark, dir)
    val threshold = 0.8 // same dials as d11 (check registry)

    val toks = time("shingle+distinct+ckpt") {
      graft.operators.Dedup.shingleRows(docs, 3)
        .select(col("doc_id"), col("shingle").as("term"))
        .distinct()
        .localCheckpoint(eager = true)
    }
    println(s"  toks rows = ${toks.count()}")

    val byDoc = time("df+doc-arrays (materialize)") {
      val df = toks.groupBy("term").agg(count(lit(1)).as("df"))
      val b = toks
        .join(df, Seq("term"))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("df"), col("term")))).as("ts"),
          count(lit(1)).as("n_tok"))
        .select(col("doc_id"), col("n_tok"),
          expr("transform(ts, t -> t.term)").as("terms"))
        .localCheckpoint(eager = true)
      b
    }
    println(s"  byDoc rows = ${byDoc.count()}")

    val prefixLen = (col("n_tok") -
      ceil(lit(threshold) * col("n_tok")).cast("long") + 1).cast("int")
    val prefix = byDoc.select(col("doc_id"), col("n_tok"),
      posexplode(slice(col("terms"), lit(1), prefixLen)).as(Seq("pos", "term")))
    val full = byDoc.select(col("doc_id"), col("n_tok"),
      posexplode(col("terms")).as(Seq("pos", "term")))

    val cand = time("candidate join (count)") {
      val c = prefix.as("a")
        .join(full.as("b"),
          col("a.term") === col("b.term") && col("a.doc_id") =!= col("b.doc_id") &&
            col("b.n_tok") >= ceil(lit(threshold) * col("a.n_tok")) &&
            (lit(1) + least(col("a.n_tok") - col("a.pos") - 1,
              col("b.n_tok") - col("b.pos") - 1)) >=
              ceil(lit(threshold) * col("a.n_tok")))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .localCheckpoint(eager = true)
      println(s"  candidates = ${c.count()}")
      c
    }

    // hash-screen variant: upper-bound intersect on xxhash64 arrays
    // (cheap longs), exact string verify only for screen survivors
    val byDocH = byDoc.withColumn("hterms",
      expr("transform(terms, t -> xxhash64(t))"))
      .localCheckpoint(eager = true)
    time("hash screen + exact verify") {
      val screened = cand
        .join(byDocH.select(col("doc_id").as("doc_a"),
          col("hterms").as("ha"), col("n_tok").as("n_a")), Seq("doc_a"))
        .join(byDocH.select(col("doc_id").as("doc_b"),
          col("hterms").as("hb")), Seq("doc_b"))
        .where(size(array_intersect(col("ha"), col("hb"))) >=
          ceil(lit(threshold) * col("n_a")))
        .select(col("doc_a"), col("doc_b"))
      val v = screened
        .join(byDocH.select(col("doc_id").as("doc_a"),
          col("terms").as("ta"), col("n_tok").as("n_a")), Seq("doc_a"))
        .join(byDocH.select(col("doc_id").as("doc_b"),
          col("terms").as("tb"), col("n_tok").as("n_b")), Seq("doc_b"))
        .select((size(array_intersect(col("ta"), col("tb")))
          .cast("double") / col("n_a").cast("double")).as("c"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("c") >= threshold, 1L).otherwise(0L)).as("qual"))
        .collect()(0)
      println(s"  screen survivors = ${v.getLong(0)}  qualifying = ${v.getLong(1)}")
    }

    time("verify (count)") {
      val v = cand
        .join(byDoc.select(col("doc_id").as("doc_a"),
          col("terms").as("ta"), col("n_tok").as("n_a")), Seq("doc_a"))
        .join(byDoc.select(col("doc_id").as("doc_b"),
          col("terms").as("tb"), col("n_tok").as("n_b")), Seq("doc_b"))
        .select((size(array_intersect(col("ta"), col("tb")))
          .cast("double") / col("n_a").cast("double")).as("c"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("c") >= threshold, 1L).otherwise(0L)).as("qual"))
        .collect()(0)
      println(s"  verified pairs = ${v.getLong(0)}  qualifying = ${v.getLong(1)}")
    }
    spark.stop()
  }
}
