package graft.operators

import graft.SparkSpec

/** Checkpoints.release must free the RDD-LEVEL blocks behind a
  * localCheckpoint — the thing `Dataset.unpersist` does NOT do there
  * (it only clears CacheManager entries; ADVICE r13). Asserted against
  * `sparkContext.getPersistentRDDs`, the same registry the executor
  * block manager serves.
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("Dataset.unpersist on a checkpoint is the documented no-op") {
    val before = persistedIds
    val cp = (1 to 100).toDF("n").localCheckpoint(eager = true)
    val pinned = persistedIds -- before
    assert(pinned.nonEmpty, "localCheckpoint should persist an RDD")
    cp.unpersist(blocking = true)
    assert((persistedIds -- before) == pinned,
      "Dataset.unpersist must NOT touch the checkpoint's RDD blocks " +
        "(if this starts failing, Spark fixed it upstream and " +
        "Checkpoints.release can be retired)")
    Checkpoints.release(cp)
  }

  test("release frees exactly the checkpoint's RDD") {
    val before = persistedIds
    val cp = (1 to 100).toDF("n").localCheckpoint(eager = true)
    assert((persistedIds -- before).nonEmpty)
    Checkpoints.release(cp)
    assert((persistedIds -- before).isEmpty,
      "release must drop the checkpointed RDD from the persistence registry")
  }

  test("release is a safe no-op on a non-checkpoint plan") {
    val before = persistedIds
    val plain = (1 to 10).toDF("n").select($"n" * 2)
    Checkpoints.release(plain) // must not throw
    assert(persistedIds == before)
  }

  test("released checkpoint data stays readable (lineage-free replay not required)") {
    // localCheckpoint blocks are MEMORY_AND_DISK on a live executor; a
    // release AFTER all consumers ran is the contract. Reading after
    // release still works in local mode because the unpersist is lazy
    // block eviction, but the CONTRACT callers rely on is: consume,
    // then release. This test pins consume-then-release end-to-end.
    val cp = (1 to 50).toDF("n").localCheckpoint(eager = true)
    val total = cp.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
    Checkpoints.release(cp)
    assert(total == 1275L)
  }
}
