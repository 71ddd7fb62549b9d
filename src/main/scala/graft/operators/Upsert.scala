package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE/upsert emulation over immutable Parquet: full-outer join the
  * current snapshot with an updates batch on the key; the update row wins
  * whole-row where the key exists in both (including update columns that
  * are NULL — a presence flag, not per-column coalesce, decides); the
  * result overwrites the snapshot. This is the copy-on-write strategy
  * Delta/Iceberg implement with file-level surgery, at the full-rewrite
  * cost the reference's overwrite-everything pipeline already pays
  * (SURVEY.md §1: no Delta jars ship in this environment).
  *
  * Precondition (same as MERGE, which errors on it): at most one update
  * row per key — duplicate keys in `updates` would fan out through the
  * join and duplicate the snapshot's key.
  */
object Upsert {

  /** @param current  existing snapshot
    * @param updates  upsert batch (same schema, unique per key)
    * @param keyCols  match keys; non-key columns take the update row's
    *                 values (NULLs included) when the key exists in both
    */
  def upsert(current: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(current.columns.sameElements(updates.columns),
      s"schema mismatch: ${current.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val payload = current.columns.filterNot(keyCols.contains).toSeq
    val cur = payload.foldLeft(current) { (df, c) => df.withColumnRenamed(c, s"__cur_$c") }
    val upd = payload.foldLeft(updates) { (df, c) => df.withColumnRenamed(c, s"__upd_$c") }
      .withColumn("__upd_present", lit(true))
    cur.join(upd, keyCols, "full_outer")
      .select(
        keyCols.map(col) ++
          payload.map(c =>
            when(col("__upd_present"), col(s"__upd_$c"))
              .otherwise(col(s"__cur_$c")).as(c)): _*)
  }
}
