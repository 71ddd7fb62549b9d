package graft.sources

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet: the engine reads and
  * writes CSV, JSON, and ORC losslessly (schema supplied on read for the
  * text formats — schema inference at 100 TB means scanning twice).
  */
class FileFormatsSpec extends SparkSpec {

  private lazy val base = Tables.lineitem(spark, sf0001)
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
    .limit(500)

  private def roundTrip(format: String): Unit = {
    val dir = graft.tools.Scratch.dir(s"fmt-$format").toString + "/t"
    base.write.format(format).mode("overwrite").save(dir)
    val back = spark.read.format(format).schema(base.schema).load(dir)
    val a = base.orderBy("l_orderkey", "l_linenumber").collect().map(_.toSeq)
    val b = back.orderBy("l_orderkey", "l_linenumber").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, s"$format round trip diverged")
  }

  test("csv round trip preserves rows (explicit schema)") { roundTrip("csv") }
  test("json round trip preserves rows (explicit schema)") { roundTrip("json") }
  test("orc round trip preserves rows") { roundTrip("orc") }

  test("csv honors header and delimiter options") {
    val dir = graft.tools.Scratch.dir("fmt-csvopts").toString + "/t"
    base.limit(10).write.option("header", "true").option("sep", "|")
      .mode("overwrite").csv(dir)
    val back = spark.read.option("header", "true").option("sep", "|")
      .schema(base.schema).csv(dir)
    assert(back.count() == 10)
    assert(back.columns.sameElements(base.columns))
  }
}
