package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: NN-descent graph quality vs the brute-force top-5 graph. */
object ScratchNnd {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val sub = Tables.embeddings(spark, dir).where(col("vec_id") < 500)
    val truth = Similarity.bruteForceTopK(sub, sub, 5)
      .select(col("q_vec").as("v"), col("c_vec").as("u"))
      .localCheckpoint(true)
    for ((bk, rounds, seedSz) <- Seq((10, 2, 16), (10, 3, 16), (15, 3, 32), (10, 4, 32), (15, 4, 32))) {
      val t0 = System.nanoTime()
      val nnd = Similarity.nnDescent(sub, graphK = bk, rounds = rounds, seedBucketSize = seedSz)
        .where(col("rank") <= 5)
        .select(col("v"), col("nbr").as("u"), lit(1L).as("hit"))
      val rec = truth.join(nnd, Seq("v", "u"), "left")
        .agg(count(lit(1)).as("n_true"), sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .collect()(0)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"buildK=$bk rounds=$rounds seed=$seedSz recall=${rec.getLong(1).toDouble / rec.getLong(0)}%.3f ${s}%.1fs")
    }
    spark.stop()
  }
}
