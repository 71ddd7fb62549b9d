package graft

import org.apache.spark.sql.functions._

/** Every SparkEntry query runs on sf0.001 and returns rows; queries with
  * oracle SQL keep their declared column aliases (the driver's compare
  * sorts columns by name — a drifted alias breaks the hash even when the
  * values match). Value-level correctness is gated by the DuckDB oracle
  * (scripts/check_oracle.py) and by the operator-level specs.
  */
class QueriesSpec extends SparkSpec {

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on sf0.001 with rows > 0") {
      val df = fn(spark, sf0001)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without matching query: $missing")
  }

  test("streaming query is re-runnable in one session (unique sink names)") {
    val a = SparkEntry.queries("st1_stream_daily")(spark, sf0001).count()
    val b = SparkEntry.queries("st1_stream_daily")(spark, sf0001).count()
    assert(a == b && a > 0)
  }

  test("approx quantiles honor the GK rank-error contract at every (flag, q)") {
    // x10 emits the bound check itself (that is what the oracle gates);
    // here assert the relation is complete and every bound held.
    val rows = SparkEntry.queries("x10_approx_quantile")(spark, sf0001).collect()
    val flags = SparkEntry.queries("a8_percentiles")(spark, sf0001)
      .collect().map(_.getString(0)).toSet
    assert(rows.length == flags.size * 3, s"expected ${flags.size}×3 rows, got ${rows.length}")
    for (r <- rows)
      assert(r.getBoolean(2), s"${r.getString(0)} q=${r.getDouble(1)} out of GK bound")
  }
}
