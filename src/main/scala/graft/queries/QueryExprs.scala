package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Cross-engine-critical shared expressions. These encodings are load-
  * bearing for oracle parity (the DuckDB SQL spells out the identical
  * arithmetic), so they live in ONE place — a rounding change here must
  * change every consumer and its oracle together.
  */
private[queries] object QueryExprs {

  /** TPC-H revenue as exact integers: line price in cents × (10000 −
    * discount basis points), widened to DECIMAL(38,0) for overflow-free
    * sums. Divide by 1e6 (cents × bp) after aggregation for the
    * double-valued revenue. Both factors floor() the double inputs, so
    * the encoding — and therefore every revenue top-N cutoff — is
    * bit-identical across engines.
    */
  def revQ: Column = (floor(col("l_extendedprice") * 100).cast(LongType) *
    (lit(10000L) - floor(col("l_discount") * 10000).cast(LongType)))
    .cast(DecimalType(38, 0))
}
