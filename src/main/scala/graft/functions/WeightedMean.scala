package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact weighted mean as a typed `Aggregator` — the UDAF surface the
  * reference has none of (SURVEY.md §2.12) and the one extension tier we
  * had not yet exercised (custom `Expression`s and a custom plan node
  * already exist; this is the documented third way to add an aggregate).
  *
  * Inputs are pre-quantized BIGINTs (value in cents, integral weight), so
  * the two running sums are exact integers and the merge is plain
  * addition — associative and commutative, which is precisely what Spark
  * requires for partial aggregation: `reduce` runs map-side, `merge`
  * combines partition partials after the shuffle, and only `finish`
  * divides (one double division, reproducible in any engine from the two
  * integer sums).
  *
  * Long arithmetic holds to ~9e18: cents (~1e7) × weight (~50) × 1e9 rows
  * per partial. Beyond that, widen the buffer to DECIMAL(38,0) sums — the
  * shape (two exact accumulators + late division) is unchanged.
  */
object WeightedMean {

  case class Buf(var num: Long, var den: Long)

  /** num += cents * weight; den += weight; finish = (num/den)/100. */
  val cents: Aggregator[(Long, Long), Buf, java.lang.Double] =
    new Aggregator[(Long, Long), Buf, java.lang.Double] {
      override def zero: Buf = Buf(0L, 0L)
      override def reduce(b: Buf, in: (Long, Long)): Buf = {
        b.num += in._1 * in._2
        b.den += in._2
        b
      }
      override def merge(a: Buf, b: Buf): Buf = {
        a.num += b.num
        a.den += b.den
        a
      }
      // Guard the zero-weight group (ADVICE r2 pattern: Spark's Divide is
      // null-on-zero with ANSI off while DuckDB is inf — return null
      // explicitly so both engines agree). Boxed output type -> nullable.
      override def finish(b: Buf): java.lang.Double =
        if (b.den == 0L) null
        else java.lang.Double.valueOf((b.num.toDouble / b.den.toDouble) / 100.0)
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }
}
