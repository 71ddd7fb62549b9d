package graft.energy

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Concurrent-writer safety of the snapshot protocol: before the claim
  * file (r7), two writers could both compute `next = max + 1` and
  * interleave task files inside ONE version directory — a torn commit
  * wearing a valid _SUCCESS marker. The atomic claim (create with
  * overwrite=false) guarantees each version number has exactly one
  * owner, so every committed snapshot is some single writer's COMPLETE
  * dataframe.
  */
class AtomicLayerConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("concurrent writers land complete, homogeneous, distinct versions") {
    val root = graft.tools.Scratch.dir("alc").toString + "/t"
    val writers = 6
    val rowsPer = 50
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dirs = Await.result(
      Future.sequence((0 until writers).map { w =>
        Future {
          AtomicLayer.write(
            (0 until rowsPer).map(i => (w.toLong, i.toLong)).toDF("writer", "i"),
            root, keepVersions = writers + 1)
        }
      }),
      5.minutes)

    // every writer got its own version directory
    assert(dirs.toSet.size == writers,
      s"version collision: ${dirs.sorted.mkString(", ")}")

    // every committed snapshot is ONE writer's complete data — no
    // interleaving, no partial commits
    val committed = AtomicLayer.committedVersions(spark, root)
    assert(committed.size == writers)
    for ((_, dir) <- committed) {
      val df = spark.read.parquet(dir)
      val writersIn = df.select("writer").distinct().collect().map(_.getLong(0))
      assert(writersIn.length == 1,
        s"$dir interleaves writers ${writersIn.mkString(",")}")
      assert(df.count() == rowsPer, s"$dir is a partial snapshot")
    }

    // no claim debris survives a clean concurrent run... except possibly
    // the highest version's (swept only by LATER writes); anything below
    // the max committed version must be gone
    val maxV = committed.map(_._1).max
    val claims = new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".claim")).map(_.getName)
    assert(claims.forall(c => c.stripPrefix("v").stripSuffix(".claim").toInt >= maxV),
      s"stale claims below the frontier: ${claims.mkString(",")}")

    // and a subsequent single write still works and becomes latest
    val after = AtomicLayer.write(Seq((99L, 0L)).toDF("writer", "i"), root,
      keepVersions = writers + 2)
    // latestCommitted returns the fs-qualified URI ("file:/tmp/...")
    val latest = AtomicLayer.latestCommitted(spark, root).get
    assert(latest.endsWith(after.stripPrefix("file:")),
      s"$latest is not the new write $after")
  }
}
