package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE/upsert emulation over immutable Parquet: full-outer join the
  * current snapshot with an updates batch on the key; updates win where
  * both exist; the result overwrites the snapshot. This is the
  * copy-on-write strategy Delta/Iceberg implement with file-level
  * surgery — semantically identical, cost = one join + full rewrite,
  * which is exactly what the reference's overwrite-everything pipeline
  * already pays (SURVEY.md §1: no Delta jars ship in this environment).
  */
object Upsert {

  /** @param current  existing snapshot
    * @param updates  upsert batch (same schema)
    * @param keyCols  match keys; non-key columns take the update's value
    *                 when the key exists in both
    */
  def upsert(current: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(current.columns.sameElements(updates.columns),
      s"schema mismatch: ${current.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val payload = current.columns.filterNot(keyCols.contains).toSeq
    val cur = payload.foldLeft(current) { (df, c) => df.withColumnRenamed(c, s"__cur_$c") }
    val upd = payload.foldLeft(updates) { (df, c) => df.withColumnRenamed(c, s"__upd_$c") }
    cur.join(upd, keyCols, "full_outer")
      .select(
        keyCols.map(col) ++
          payload.map(c => coalesce(col(s"__upd_$c"), col(s"__cur_$c")).as(c)): _*)
  }
}
