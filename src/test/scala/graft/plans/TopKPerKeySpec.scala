package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy(col("v").desc, col("id"))))
      .where(col("rn") <= k).drop("rn")

  test("topKPerKey equals the window formulation on random data") {
    val rnd = new scala.util.Random(42)
    val df = (1 to 2000).map(i => (i.toLong, s"k${rnd.nextInt(37)}", rnd.nextInt(500)))
      .toDF("id", "key", "v").repartition(8)
    val got = TopKPerKey.topKPerKey(df, Seq("key"),
        Seq("v" -> false, "id" -> true), k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val want = windowTopK(df, 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got === want)
  }

  test("groups smaller than k survive whole; k=1 is per-key argmax") {
    val df = Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 5))
      .toDF("id", "key", "v")
    val top5 = TopKPerKey.topKPerKey(df, Seq("key"), Seq("v" -> false, "id" -> true), 5)
    assert(top5.count() === 3)
    val top1 = TopKPerKey.topKPerKey(df, Seq("key"), Seq("v" -> false, "id" -> true), 1)
      .collect().map(r => r.getString(1) -> r.getInt(2)).toMap
    assert(top1 === Map("a" -> 20, "b" -> 5))
  }

  test("plans as partial heaps -> exchange -> final heaps, shuffling only survivors") {
    val df = spark.range(10000)
      .select(col("id"), (col("id") % 10).as("key"), (col("id") * 7 % 1000).as("v"))
      .repartition(8)
    // AQE's query stages hide the partial exec from plan traversal (same
    // introspection limit as PlanSpec's DPP test); the operator itself
    // runs identically either way.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val executed = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val q = TopKPerKey.topKPerKey(df, Seq("key"), Seq("v" -> false, "id" -> true), 2)
      q.collect()
      q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val execs = executed.collect { case t: TopKPerKeyExec => t }
    assert(execs.length === 2 && execs.count(_.partial) === 1,
      s"expected partial+final TopKPerKeyExec:\n${executed.toString.take(800)}")
    // the key-hash exchange between the phases carries at most
    // partitions*keys*k rows (8*10*2 = 160), never the child's 10000
    // (the round-robin repartition(8) exchange is excluded — that one
    // legitimately carries all rows)
    val shuffled = executed.collect {
      case e: ShuffleExchangeLike
        if e.outputPartitioning.isInstanceOf[HashPartitioning] =>
        e.metrics("shuffleRecordsWritten").value
    }
    assert(shuffled.nonEmpty && shuffled.forall(n => n > 0 && n <= 160),
      s"key-hash shuffle carried $shuffled rows; partial phase did not bound it")
  }

  test("dedup: duplicated rows neither shift ranks nor displace distinct survivors") {
    // The NN-descent fold contract (optimization r16): rows sharing the
    // dedup key are full-row-identical; top-k over the DISTINCT rows
    // must equal distinct().window() — duplicates never occupy two heap
    // slots (the rank-shift hazard that forced the settled-edge
    // anti-join), wherever in the stream they arrive and however the
    // input is partitioned.
    val rnd = new scala.util.Random(7)
    // v is a FUNCTION of (key, id) — the contract: rows sharing the
    // dedup key within a group are identical
    val base = (1 to 600).map { i =>
      val id = i.toLong % 50
      val key = s"k${rnd.nextInt(17)}"
      (id, key, (id.toInt * (key.length + key.last.toInt)) % 97)
    }
    // duplicate a random subset of the rows 1-3 extra times
    val dups = base.flatMap(r => Seq.fill(rnd.nextInt(4))(r))
    val df = rnd.shuffle(base ++ dups)
      .toDF("id", "key", "v")
      .select(col("key"), col("id"), col("v"))
      .repartition(7)
    val got = TopKPerKey.topKPerKey(df, Seq("key"),
        Seq("v" -> false, "id" -> true), k = 3,
        dedupCols = Seq("id"), rankCol = Some("rn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val want = df.distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy(col("v").desc, col("id"))))
      .where(col("rn") <= 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(got === want)
  }

  test("dedup: a duplicate of an EVICTED row re-competes instead of being dropped") {
    // one partition, adversarial order: (id=1) enters the k=1 heap, is
    // evicted by the better (id=2), then (id=1) re-arrives — the heap
    // must treat it as live again (held-set entries are released on
    // eviction), so the final heap is exactly the distinct-rows top-1.
    val df = Seq((1L, "a", 10), (2L, "a", 20), (1L, "a", 10))
      .toDF("id", "key", "v").coalesce(1)
    val got = TopKPerKey.topKPerKey(df, Seq("key"),
        Seq("v" -> false, "id" -> true), k = 2, dedupCols = Seq("id"))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(got === Set((1L, 10), (2L, 20)))
  }

  test("deterministic under input partitioning changes (total sort order)") {
    val df = (1 to 500).map(i => (i.toLong, s"k${i % 7}", i * 13 % 100))
      .toDF("id", "key", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      TopKPerKey.topKPerKey(d, Seq("key"), Seq("v" -> false, "id" -> true), 4)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(run(df) === run(df.repartition(13)))
  }
}
