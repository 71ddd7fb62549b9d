package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2: turn a change log (one row per
  * version event) into interval-versioned history — each row carries
  * [effective_from, effective_to) and an is_current flag.
  *
  * One window per key ordered by (ts, tiebreak): a single shuffle on the
  * key, then linear per-partition work. The tiebreak column makes the
  * version order total when two changes share a timestamp, so the
  * produced intervals are deterministic (the same contract as
  * [[AsOfJoin]]'s ordering).
  *
  * At scale this is the standard "rebuild the dimension from the log"
  * batch: state never accumulates anywhere — it IS the window frame.
  */
object Scd2 {

  def buildHistory(
      log: DataFrame,
      key: Column,
      ts: Column,
      tiebreak: Column,
  ): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    log
      .withColumn("version", row_number().over(w))
      .withColumn("effective_from", ts)
      .withColumn("effective_to", lead(ts, 1).over(w))
      .withColumn("is_current", col("effective_to").isNull.cast("int"))
  }
}
