package graft.operators

import graft.{SparkSpec, Tables}
import graft.energy.AtomicLayer
import org.apache.spark.sql.functions._

/** The persisted NN-descent graph index (x37/x38, VERDICT r10 #1):
  * build-once artifacts under AtomicLayer snapshots, serve-from-disk
  * that never constructs a graph, and the append / delete / resurrect /
  * compact lifecycle — the graph analogue of AnnIndexSpec's IVFADC pins.
  */
class GraphIndexSpec extends SparkSpec {

  private def tmpRoot(): String =
    graft.tools.Scratch.dir("graph-index").toString + "/gidx"

  private def serve(root: String, corpusBound: Int) = {
    val emb = Tables.embeddings(spark, sf0001)
    Similarity.graphAnnServeFromIndex(
        emb.where(col("vec_id") < 4), emb.where(col("vec_id") < corpusBound),
        root, k = 5, beam = 8, rounds = 3, degree = 5)
      .orderBy("q_vec", "rank")
  }

  test("build-once + NO-BUILD-IN-SERVE: serving the artifact never constructs a graph") {
    val emb = Tables.embeddings(spark, sf0001)
    val sub = emb.where(col("vec_id") < 120)
    val root = tmpRoot()
    Similarity.buildNndGraphIndex(sub, root)
    val v0 = AtomicLayer.latestCommitted(spark, s"$root/edges.parquet")
    assert(v0.isDefined && v0.get.endsWith("/v0"), "first build should commit v0")

    // second build without force: skip — no new version
    Similarity.buildNndGraphIndex(sub, root)
    assert(AtomicLayer.latestCommitted(spark, s"$root/edges.parquet") == v0,
      "build without force must not rewrite a committed graph")

    // the guard itself: a full serve (plan + execute) bumps the build
    // counter zero times, and writes no new snapshot — the serve path is
    // read-only over the artifact
    val before = Similarity.nndBuilds.get()
    val served = serve(root, 120).collect().toSeq
    assert(Similarity.nndBuilds.get() == before,
      "graphAnnServeFromIndex must never run an NN-descent build")
    assert(AtomicLayer.latestCommitted(spark, s"$root/edges.parquet") == v0,
      "serving must not write index snapshots")
    assert(served.nonEmpty)

    // serve-from-disk ≡ the in-memory beam over the same edge relation
    val edges = AtomicLayer.read(spark, s"$root/edges.parquet")
      .where(col("rank") <= 5).select(col("v"), col("nbr"))
    val inline = Similarity.graphAnnBeamServe(
        edges, sub, emb.where(col("vec_id") < 4), k = 5, beam = 8, rounds = 3)
      .orderBy("q_vec", "rank").collect().toSeq
    assert(served == inline,
      s"persisted-graph serve diverged from the in-memory beam:\n$served\nvs\n$inline")
  }

  test("append inserts new nodes O(|new|), is id-keyed idempotent, and serves them") {
    val emb = Tables.embeddings(spark, sf0001)
    val old = emb.where(col("vec_id") < 100)
    val nw = emb.where(col("vec_id") >= 100 && col("vec_id") < 130)
    val root = tmpRoot()
    Similarity.buildNndGraphIndex(old, root)
    val buildsBefore = Similarity.nndBuilds.get()

    Similarity.appendToNndGraphIndex(old, nw, root)
    assert(Similarity.nndBuilds.get() == buildsBefore,
      "append must merge into the stored graph, never rebuild it")
    val merged = AtomicLayer.read(spark, s"$root/edges.parquet")
    assert(merged.select("v").distinct().count() == 130,
      "every old and new node must carry edges after the append")
    val snap1 = merged.orderBy("v", "rank").collect().toSeq

    // idempotence: re-delivering the same batch changes nothing
    Similarity.appendToNndGraphIndex(old, nw, root)
    val snap2 = AtomicLayer.read(spark, s"$root/edges.parquet")
      .orderBy("v", "rank").collect().toSeq
    assert(snap2 == snap1, "re-appending the same ids must be a no-op")

    // new nodes are reachable from the serve path
    val got = serve(root, 130).select("c_vec").collect().map(_.getLong(0)).toSet
    val gotNew = Similarity.graphAnnServeFromIndex(
        emb.where(col("vec_id") >= 100 && col("vec_id") < 104),
        emb.where(col("vec_id") < 130), root, k = 5)
      .collect()
    assert(gotNew.length == 4 * 5, "appended nodes must be servable as queries")
    assert((got ++ gotNew.map(_.getLong(2))).exists(_ >= 100),
      "appended nodes must be reachable in results")
  }

  test("stream insert is BATCHING-INVARIANT: n micro-batches = one big batch") {
    val emb = Tables.embeddings(spark, sf0001)
    val old = emb.where(col("vec_id") < 100)
    val nw = emb.where(col("vec_id") >= 100 && col("vec_id") < 130)

    def streamBuilt(batches: Seq[org.apache.spark.sql.DataFrame]): Seq[org.apache.spark.sql.Row] = {
      val root = tmpRoot()
      Similarity.buildNndGraphIndex(old, root)
      Similarity.freezeGraphIndexBase(spark, root)
      batches.foreach(b => Similarity.streamInsertIntoGraphIndex(old, b, root))
      AtomicLayer.read(spark, s"$root/edges.parquet")
        .orderBy("v", "rank").collect().toSeq
    }

    val oneShot = streamBuilt(Seq(nw))
    val threeBatches = streamBuilt(Seq(
      emb.where(col("vec_id") >= 100 && col("vec_id") < 111),
      emb.where(col("vec_id") >= 111 && col("vec_id") < 122),
      emb.where(col("vec_id") >= 122 && col("vec_id") < 130)))
    assert(threeBatches == oneShot,
      "the final edge artifact must be independent of micro-batching")
    // redelivery: replaying a batch into the finished index is a no-op
    val root2 = tmpRoot()
    Similarity.buildNndGraphIndex(old, root2)
    Similarity.freezeGraphIndexBase(spark, root2)
    Similarity.streamInsertIntoGraphIndex(old, nw, root2)
    val snap = AtomicLayer.read(spark, s"$root2/edges.parquet")
      .orderBy("v", "rank").collect().toSeq
    Similarity.streamInsertIntoGraphIndex(old,
      emb.where(col("vec_id") >= 100 && col("vec_id") < 111), root2)
    assert(AtomicLayer.read(spark, s"$root2/edges.parquet")
      .orderBy("v", "rank").collect().toSeq == snap,
      "redelivered batches must not change the artifact")
  }

  test("delete makes nodes unreachable on BOTH endpoints; re-add resurrects; compact folds") {
    val emb = Tables.embeddings(spark, sf0001)
    val sub = emb.where(col("vec_id") < 120)
    val root = tmpRoot()
    Similarity.buildNndGraphIndex(sub, root)

    val baseline = serve(root, 120).collect().toSeq
    val hitIds = baseline.map(_.getLong(2)).toSet
    assert(hitIds.nonEmpty)
    // delete every baseline hit >= 4 (queries are 0..3) — the strongest
    // form of "a deleted node must leave the traversal"
    val dead = hitIds.filter(_ >= 4)
    assert(dead.nonEmpty, "fixture must place some non-query ids in the results")
    import spark.implicits._
    Similarity.deleteFromGraphIndex(dead.toSeq.toDF("vec_id"), root)

    val after = serve(root, 120).collect().toSeq
    val afterIds = after.map(_.getLong(2)).toSet
    assert(afterIds.intersect(dead).isEmpty,
      s"tombstoned ids still served: ${afterIds.intersect(dead)}")
    assert(after.nonEmpty, "the graph must keep serving around deleted nodes")

    // delete is idempotent and O(batch): tombstone rows = |dead ids|
    Similarity.deleteFromGraphIndex(dead.toSeq.toDF("vec_id"), root)
    assert(AtomicLayer.read(spark, s"$root/tombstones.parquet").count() == dead.size)

    // RESURRECTION: re-adding the dead ids clears their tombstones and
    // the original results come back exactly (edges were never removed)
    Similarity.appendToNndGraphIndex(sub,
      emb.where(col("vec_id").isin(dead.toSeq: _*)), root)
    assert(AtomicLayer.read(spark, s"$root/tombstones.parquet").count() == 0)
    assert(serve(root, 120).collect().toSeq == baseline,
      "re-add must resurrect the exact pre-delete serving state")

    // compaction: delete again, compact — tombstones empty, dead edges
    // physically gone, ranks re-contiguous. Serving MAY legitimately
    // differ from the pre-compact tombstone-filtered form (compaction
    // RE-RANKS, promoting rank-6..15 survivors into the degree-5 serve
    // window a filtered-but-unranked graph starves out of), so the pins
    // are: dead ids stay excluded, and the artifact serve equals the
    // in-memory beam over the same recomputed edge relation.
    Similarity.deleteFromGraphIndex(dead.toSeq.toDF("vec_id"), root)
    Similarity.compactGraphIndex(spark, root)
    assert(AtomicLayer.read(spark, s"$root/tombstones.parquet").count() == 0)
    val edges = AtomicLayer.read(spark, s"$root/edges.parquet")
    assert(edges.where(col("v").isin(dead.toSeq: _*) ||
      col("nbr").isin(dead.toSeq: _*)).count() == 0,
      "compaction must drop every edge touching a dead node")
    val rankGaps = edges.groupBy("v")
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
      .where(col("n") =!= col("mx")).count()
    assert(rankGaps == 0, "compaction must re-rank to contiguous 1..n per node")
    val compacted = serve(root, 120).collect().toSeq
    assert(compacted.map(_.getLong(2)).toSet.intersect(dead).isEmpty,
      "compaction must keep dead ids unreachable without tombstones")
    val inline = Similarity.graphAnnBeamServe(
        edges.where(col("rank") <= 5).select(col("v"), col("nbr")),
        sub.join(dead.toSeq.toDF("vec_id"), Seq("vec_id"), "left_anti"),
        emb.where(col("vec_id") < 4), k = 5, beam = 8, rounds = 3)
      .orderBy("q_vec", "rank").collect().toSeq
    assert(compacted == inline,
      "compacted-artifact serve must equal the in-memory beam over the same edges")
  }

  test("reconcile repairs cross-batch new×new gaps: monotone per-rank cosine, no build, recall recovers") {
    val emb = Tables.embeddings(spark, sf0001)
    val old = emb.where(col("vec_id") < 100)
    val all = emb.where(col("vec_id") < 130)
    val root = tmpRoot()
    Similarity.buildNndGraphIndex(old, root)
    Similarity.freezeGraphIndexBase(spark, root)
    // three micro-batches — cross-batch new×new neighborhoods are
    // unlinked BY DESIGN (each batch locates over the frozen base only)
    Seq((100, 111), (111, 122), (122, 130)).foreach { case (a, b) =>
      Similarity.streamInsertIntoGraphIndex(old,
        emb.where(col("vec_id") >= a && col("vec_id") < b), root)
    }
    val truth = Similarity.bruteForceTopK(all, all, k = 5)
      .select(col("q_vec").as("v"), col("c_vec").as("nbr"))
      .localCheckpoint(eager = true)
    def recall(edges: org.apache.spark.sql.DataFrame, newOnly: Boolean): Double = {
      val t = if (newOnly) truth.where(col("v") >= 100) else truth
      val hits = t.join(edges.where(col("rank") <= 5).select("v", "nbr"),
        Seq("v", "nbr"), "left_semi").count()
      hits.toDouble / t.count()
    }
    val before = AtomicLayer.read(spark, s"$root/edges.parquet")
      .localCheckpoint(eager = true)
    val (beforeAll, beforeNew) = (recall(before, false), recall(before, true))

    val buildsBefore = Similarity.nndBuilds.get()
    Similarity.reconcileGraphIndex(all, root)
    assert(Similarity.nndBuilds.get() == buildsBefore,
      "reconcile is one refinement round, never an NN-descent rebuild")
    val after = AtomicLayer.read(spark, s"$root/edges.parquet")
      .localCheckpoint(eager = true)

    // MONOTONE-IMPROVEMENT LAW: descentRounds re-prunes the union of the
    // CURRENT edges with the new candidates, so for every (v, rank) the
    // post-reconcile neighbor cosine is >= the pre-reconcile one — an
    // existing link is only ever displaced by a strictly better one.
    val regressed = before.alias("b")
      .join(after.alias("a"), Seq("v", "rank"))
      .where(col("a.cosine") < col("b.cosine"))
      .count()
    assert(regressed == 0,
      s"reconcile regressed $regressed (v, rank) slots — must be monotone")
    assert(after.select("v").distinct().count() ==
      before.select("v").distinct().count(),
      "reconcile must keep every indexed node")

    // RECALL CENSUS (the st29 trade, measured): the stream-built index
    // under-links new×new; one reconcile round must recover recall — at
    // minimum never lose any, and strictly improve the new-node share
    // this fixture's 3-batch split starves.
    val (afterAll, afterNew) = (recall(after, false), recall(after, true))
    assert(afterAll >= beforeAll && afterNew >= beforeNew,
      s"recall dropped: all $beforeAll->$afterAll new $beforeNew->$afterNew")
    assert(afterNew > beforeNew,
      s"expected strict new-node recall recovery, got $beforeNew -> $afterNew " +
        "(if the fixture's batches stopped starving new×new links, tighten the split)")
  }
}
