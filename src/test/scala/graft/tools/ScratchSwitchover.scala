package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only recall census behind SCALE.md's exact→bounded switchover
  * table (VERDICT r13 #2): for each truth-harness query, measure what
  * its bounded production tier actually catches at the truth query's
  * own threshold, on the SF dir in SPARK_GRAFT_SF_DIR.
  *
  *  - ssj1 (exact Jaccard ≥ 0.7) vs d2's banded MinHash-LSH (16 hashes,
  *    4 bands): dr1 IS this census — read its rows and report recall
  *    over the qualifying buckets (jb ≥ 14 ⇔ J ≥ 0.7).
  *  - d11 (exact containment ≥ 0.8) vs winnowing (win1's selector,
  *    k=8 w=4): fraction of truth pairs sharing ≥ 1 selected
  *    fingerprint — the candidate-generation recall of a
  *    winnowed-candidates + exact-verify tier.
  *  - scont1 (exact NN census) vs scont2 (persisted IVF, nProbe=2/16):
  *    contamination recall (flagged by both / flagged by exact) and
  *    rank-1 neighbor agreement.
  *
  * Prints one JSON line; referenced from SCALE.md — not a product
  * surface.
  */
object ScratchSwitchover {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    // 1. LSH-vs-exact-Jaccard recall straight from dr1's census rows
    val dr1 = graft.SparkEntry.queries("dr1_dedup_recall")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (qt, qd) = dr1.filter(_._1 >= 14)
      .foldLeft((0L, 0L)) { case ((t, d), (_, nt, nd)) => (t + nt, d + nd) }
    val lshRecall = if (qt == 0) -1.0 else qd.toDouble / qt

    // 2. winnowed-candidate recall against d11's exact containment truth
    val docs = graft.Tables.documentsParallel(spark, dir)
    val truth = graft.operators.SetSimilarityJoin
      .containmentJoin(docs, shingleK = 3, threshold = 0.8)
      .select("doc_a", "doc_b")
      .localCheckpoint(eager = true)
    val fps = graft.operators.Contamination.winnowedFingerprints(docs)
      .select("doc_id", "fp").distinct()
      .localCheckpoint(eager = true)
    val shared = truth
      .join(fps.select(col("doc_id").as("doc_a"), col("fp")), Seq("doc_a"))
      .join(fps.select(col("doc_id").as("doc_b"), col("fp")), Seq("doc_b", "fp"),
        "left_semi")
      .select("doc_a", "doc_b").distinct()
    val nTruth = truth.count()
    val nShared = shared.count()
    val winRecall = if (nTruth == 0) -1.0 else nShared.toDouble / nTruth

    // 3. IVF-vs-exact contamination recall + NN agreement
    val s1 = graft.SparkEntry.queries("scont1_semantic_contamination")(spark, dir)
      .select(col("vec_id"), col("nn_train").as("nn1"),
        col("contaminated").as("c1"))
    val s2 = graft.SparkEntry.queries("scont2_semantic_contamination_ivf")(spark, dir)
      .select(col("vec_id"), col("nn_train").as("nn2"),
        col("contaminated").as("c2"))
    val j = s1.join(s2, Seq("vec_id"), "left").agg(
      sum(when(col("c1"), 1L).otherwise(0L)).as("n_cont"),
      sum(when(col("c1") && coalesce(col("c2"), lit(false)), 1L).otherwise(0L))
        .as("n_caught"),
      sum(when(col("nn1") === col("nn2"), 1L).otherwise(0L)).as("n_agree"),
      count(lit(1)).as("n")).head
    val scontRecall =
      if (j.getLong(0) == 0) -1.0 else j.getLong(1).toDouble / j.getLong(0)
    val nnAgree = j.getLong(2).toDouble / j.getLong(3)

    println(
      s"""{"sf":"$dir","lsh_recall_j07":$lshRecall,"lsh_true_pairs":$qt,""" +
        s""""win_candidate_recall_c08":$winRecall,"d11_true_pairs":$nTruth,""" +
        s""""scont_ivf_recall":$scontRecall,"scont_nn_agreement":$nnAgree}""")
    spark.stop()
  }
}
