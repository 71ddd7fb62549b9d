package graft.operators

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("update row wins whole-row, including NULL assignments") {
    val current = Seq((1L, Some("active"), Some(10.0)), (2L, Some("idle"), Some(5.0)))
      .toDF("k", "status", "score")
    val updates = Seq((1L, Option.empty[String], Some(11.0)), (3L, Some("new"), Some(1.0)))
      .toDF("k", "status", "score")
    val res = Upsert.upsert(current, updates, Seq("k"))
      .orderBy("k").collect()
    assert(res.length == 3)
    // matched key 1: the update's NULL status is applied, not coalesced away
    assert(res(0).isNullAt(res(0).fieldIndex("status")))
    assert(res(0).getAs[Double]("score") == 11.0)
    // untouched key 2 keeps its row; new key 3 appended
    assert(res(1).getAs[String]("status") == "idle")
    assert(res(2).getAs[String]("status") == "new")
  }
}
