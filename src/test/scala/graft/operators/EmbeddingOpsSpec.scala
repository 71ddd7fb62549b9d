package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.sum

class EmbeddingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.0f, 2.0f, 0.0f), 0),
    (3L, Array(0.5f, 0.5f, 0.5f), 1),
  ).toDF("vec_id", "embedding", "label")

  test("norms: exact quantized squares; unit vector has norm 1") {
    val r = EmbeddingOps.norms(emb).orderBy("vec_id").collect()
    // q(1.0) = 2^20 exactly -> qnorm2 = 2^40, norm = 1.0 bit-exact
    assert(r(0).getAs[Long]("qnorm2") == (1L << 40))
    assert(r(0).getAs[Double]("norm") == 1.0)
    assert(r(1).getAs[Double]("norm") == 2.0)
    assert(r(0).getAs[Int]("n_dims") == 3)
  }

  test("centroids: per-(label, dim) averages over exact sums") {
    val r = EmbeddingOps.centroids(emb)
      .orderBy("label", "dim").collect()
    // label 0, dim 0: vecs (1.0, 0.0) -> mean 0.5; dim 1: (0.0, 2.0) -> 1.0
    val l0 = r.filter(_.getAs[Int]("label") == 0)
    assert(l0(0).getAs[Double]("centroid") == 0.5)
    assert(l0(1).getAs[Double]("centroid") == 1.0)
    assert(l0.forall(_.getAs[Long]("n_vecs") == 2))
    // label 1: the single vector is its own centroid
    val l1 = r.filter(_.getAs[Int]("label") == 1)
    assert(l1.forall(_.getAs[Double]("centroid") == 0.5))
  }

  test("int8 stats: clipping counted, quantized extremes clamp to ±127") {
    val wild = Seq((9L, Array(2.0f, -3.0f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = EmbeddingOps.int8QuantStats(wild).collect().head
    assert(r.getAs[Int]("n_clipped") == 2)
    assert(r.getAs[Long]("max_q8") == 127L)
    assert(r.getAs[Long]("min_q8") == -127L)
    // sum = 127 - 127 + floor(0.5*127)=63
    assert(r.getAs[Long]("sum_q8") == 63L)
  }

  test("edge parity with SQL semantics: empty vecs drop, null elements skip") {
    val edgy = Seq(
      (1L, Array[java.lang.Float](), 0),
      (2L, Array[java.lang.Float](1.0f, null, 0.5f), 0),
    ).toDF("vec_id", "embedding", "label")
    val n = EmbeddingOps.norms(edgy).collect()
    assert(n.length == 1, "empty embedding must drop (UNNEST semantics)")
    // null element skipped: qnorm2 = q(1)^2 + q(0.5)^2
    val q1 = 1048576L; val qh = 524288L
    assert(n.head.getAs[Long]("qnorm2") == q1 * q1 + qh * qh)
    val s = EmbeddingOps.int8QuantStats(edgy).orderBy("vec_id").collect()
    assert(s(0).getAs[Long]("sum_q8") == 0L, "empty vec sums to 0 like COALESCE(list_sum)")
    assert(s(1).getAs[Long]("sum_q8") == 127L + 63L, "null element skipped")
  }

  test("kmeans assignment: vectors go to their own label's centroid") {
    // two well-separated labels: every vector must come back to its label
    val sep = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.1f, 0.9f), 1),
    ).toDF("vec_id", "embedding", "label")
    val assigned = EmbeddingOps
      .assignToCentroids(sep, EmbeddingOps.centroids(sep))
      .orderBy("vec_id").collect()
    assert(assigned.map(_.getAs[Int]("cluster")).toSeq == Seq(0, 0, 1, 1))
    assert(assigned.forall(_.getAs[Long]("qdist") >= 0L))
  }

  test("kmeans assignment: empty embeddings drop instead of landing in label 0") {
    val mixed = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.0f, 1.0f), 1),
      (3L, Array[Float](), 1),
    ).toDF("vec_id", "embedding", "label")
    val assigned = EmbeddingOps
      .assignToCentroids(mixed, EmbeddingOps.centroids(mixed))
      .collect().map(_.getLong(0)).toSet
    assert(assigned == Set(1L, 2L), "vec 3 has no dims -> no assignment row")
  }

  // NOTE: strict monotonicity holds for this fixture; floor-quantized
  // centroids can in principle tick the integer objective up by a
  // q-unit on adversarial data (see kmeansFit scaladoc).
  test("kmeans fit: Lloyd objective is non-increasing across rounds") {
    // noisy two-cluster data with DELIBERATELY bad initial labels: the
    // loop must untangle them and the objective must never go up
    val pts = (0 until 40).map { i =>
      val c = i % 2
      val base = if (c == 0) 0.0f else 1.0f
      (i.toLong, Array(base + (i % 5) * 0.01f, base - (i % 3) * 0.01f), i % 3) // wrong labels
    }.toDF("vec_id", "embedding", "label")
    def objective(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("qdist")).collect().head.getLong(0)
    val o1 = objective(EmbeddingOps.kmeansFit(pts, iterations = 1))
    val o2 = objective(EmbeddingOps.kmeansFit(pts, iterations = 2))
    val o3 = objective(EmbeddingOps.kmeansFit(pts, iterations = 3))
    assert(o2 <= o1 && o3 <= o2, s"objective rose: $o1 -> $o2 -> $o3")
    // the two geometric clusters must separate regardless of init labels
    val fin = EmbeddingOps.kmeansFit(pts, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val g0 = (0 until 40 by 2).map(i => fin(i.toLong)).toSet
    val g1 = (1 until 40 by 2).map(i => fin(i.toLong)).toSet
    assert(g0.size == 1 && g1.size == 1 && g0 != g1,
      s"clusters failed to separate: $g0 vs $g1")
  }

  test("kmeans assignment plan: map-only — centroids broadcast, corpus never shuffled") {
    // restoreScanParallelism=false pins the MANY-SPLIT branch (the one a
    // real corpus takes) deterministically: with the default, the guard
    // in withScanParallelism may insert a round-robin repartition when
    // the local fixture plans fewer splits than defaultParallelism/2 —
    // that conditional shuffle is the fixture-parallelism restore, not
    // the scoring, and must not be what this invariant measures
    // (ADVICE r12: the default-path pass depended on the 3-row fixture
    // happening to plan >= local[4]/2 partitions).
    val df = EmbeddingOps.assignToCentroids(
      emb, EmbeddingOps.centroids(emb), restoreScanParallelism = false)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      plan.take(500))
    // The corpus contributes ZERO exchanges: the argmin is a per-row fold
    // over the one broadcast centroid row, so the only shuffles left are
    // the centroid build's tiny aggregations ((label, dim) averaging,
    // per-label array fold, single-row collect). The old shape's
    // corpus-cardinality argmin aggregate keyed on vec_id must stay gone.
    val shuffles = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(shuffles <= 3, s"scoring introduced a shuffle:\n${plan.take(800)}")
    assert(!plan.contains("keys=[vec_id"),
      s"assignment re-grew a vec_id-keyed aggregate (corpus-cardinality shuffle):\n${plan.take(800)}")
    // And no RoundRobinPartitioning anywhere on this branch: the scoring
    // itself must never repartition the corpus.
    assert(!plan.contains("RoundRobinPartitioning"),
      s"no-restore branch still repartitions the corpus:\n${plan.take(800)}")
  }

  test("norms/int8 are narrow (no shuffle); centroids shuffle once") {
    val nPlan = EmbeddingOps.norms(emb).queryExecution.executedPlan.toString
    assert(!nPlan.contains("Exchange"), nPlan.take(300))
    val cPlan = EmbeddingOps.centroids(emb).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(cPlan).size == 1, cPlan.take(300))
  }

  private def emb4d = {
    val rnd = new scala.util.Random(9)
    (1 to 200).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1), rnd.nextInt(4))
    }.toDF("vec_id", "embedding", "label")
  }

  test("pqAssign: per-subspace argmin sum never exceeds the full-space argmin") {
    // For every label L, Σ_s dist_s(L) equals the full distance to L, so
    // minimizing each subspace independently can only do better:
    // Σ_s min_L dist_s(L) <= min_L Σ_s dist_s(L) = assignToCentroids' qdist.
    val df = emb4d
    val cents = EmbeddingOps.centroids(df)
    val pq = EmbeddingOps.pqAssign(df, cents, nSub = 4)
      .select("vec_id", "qdist_total").as[(Long, Long)].collect().toMap
    val full = EmbeddingOps.assignToCentroids(df, cents)
      .select("vec_id", "qdist").as[(Long, Long)].collect().toMap
    assert(pq.keySet === full.keySet)
    for ((id, d) <- pq) assert(d <= full(id), s"vec $id: PQ $d > full ${full(id)}")
  }

  test("pqAssign: codes are valid labels and assignment is partitioning-invariant") {
    val df = emb4d
    val cents = EmbeddingOps.centroids(df)
    def run(parts: Int) = EmbeddingOps.pqAssign(df.repartition(parts), cents, nSub = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))).toMap
    val a = run(2)
    assert(a === run(13))
    val labels = df.select("label").distinct().as[Int].collect().toSet
    a.values.foreach { case (c0, c1, c2, c3, _) =>
      assert(Set(c0, c1, c2, c3).subsetOf(labels))
    }
  }

  test("pqAssign drops vectors whose length does not split into nSub") {
    val mixed = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.5f), 0),
      (2L, Array(1.0f, 0.0f, 0.0f), 1), // 3 dims, nSub=4 -> dropped
    ).toDF("vec_id", "embedding", "label")
    val out = EmbeddingOps.pqAssign(mixed, EmbeddingOps.centroids(mixed), nSub = 4)
    assert(out.select("vec_id").as[Long].collect().toSeq === Seq(1L))
  }
}
