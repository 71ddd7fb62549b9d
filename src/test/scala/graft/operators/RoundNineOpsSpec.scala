package graft.operators

import java.security.MessageDigest

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariant laws for the round-9 additions — properties the DuckDB
  * oracle hash can't articulate (it proves cross-engine equality, not
  * that either side computes the RIGHT statistic).
  */
class RoundNineOpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  private def md5Hash60(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("kt1: counts and tau-b match a brute-force pair enumeration") {
    val daily = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_returnflag").as("flag"),
        to_date(col("l_shipdate")).as("day"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("x"),
        sum(col("l_quantity").cast("long")).as("y"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => (r.getLong(2), r.getLong(3))).toVector)
      .toMap
    val got = q("kt1_kendall_tau").collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val flag = r.getString(0)
      val pts = daily(flag)
      var nc = 0L; var nd = 0L; var n1 = 0L; var n2 = 0L
      for (i <- pts.indices; j <- (i + 1) until pts.size) {
        val (xa, ya) = pts(i); val (xb, yb) = pts(j)
        if (xa == xb) n1 += 1
        if (ya == yb) n2 += 1
        if ((xa < xb && ya < yb) || (xa > xb && ya > yb)) nc += 1
        else if ((xa < xb && ya > yb) || (xa > xb && ya < yb)) nd += 1
      }
      val n = pts.size.toLong
      assert(r.getLong(1) == n, s"$flag n_days")
      assert(r.getLong(2) == nc && r.getLong(3) == nd, s"$flag nc/nd")
      assert(r.getLong(4) == n1 && r.getLong(5) == n2, s"$flag ties")
      val n0 = n * (n - 1) / 2
      val tau = (nc - nd).toDouble /
        math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble)
      assert(r.getDouble(6) == tau, s"$flag tau-b formula")
      assert(math.abs(r.getDouble(6)) <= 1.0, s"$flag |tau| bound")
    }
  }

  test("chao1: estimator is >= observed richness and exact from first principles") {
    val toks = Tables.documents(spark, sf0001)
      .select(col("source"), explode(TextAnalysis.words(col("text"))).as("t"))
      .where(col("t") =!= "")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySrc = toks.groupBy(_._1)
    for (r <- q("chao1_vocab_richness").collect()) {
      val counts = bySrc(r.getString(0)).groupBy(_._2).view
        .mapValues(_.length.toLong).toMap
      val d = counts.size.toLong
      val f1 = counts.values.count(_ == 1L).toLong
      val f2 = counts.values.count(_ == 2L).toLong
      assert(r.getLong(1) == d && r.getLong(2) == f1 && r.getLong(3) == f2)
      val est = d.toDouble + (f1 * (f1 - 1)).toDouble / (2.0 * (f2 + 1).toDouble)
      assert(r.getDouble(4) == est, "chao1 formula replay")
      assert(r.getDouble(4) >= d.toDouble, "estimator never below observed")
    }
  }

  test("tv1: distance is in [0,1] and the integer numerator is exact") {
    val toks = Tables.documents(spark, sf0001)
      .select(col("source"), explode(TextAnalysis.words(col("text"))).as("t"))
      .where(col("t") =!= "")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = toks.length.toLong
    val global = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val rows = q("tv1_distribution_shift").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val src = r.getString(0)
      val mine = toks.filter(_._1 == src).groupBy(_._2).view
        .mapValues(_.length.toLong).toMap
      val ns = mine.values.sum
      assert(r.getLong(1) == ns, s"$src token mass")
      // full-vocabulary TV numerator: Σ_t |cs·N − c·Ns| over ALL terms
      // (terms absent from the source contribute c·Ns) — the query's
      // closed-form missing-mass fold must equal this definition.
      val num = global.iterator.map { case (t, c) =>
        math.abs(mine.getOrElse(t, 0L) * n - c * ns)
      }.sum
      assert(r.getLong(2) == num, s"$src tv numerator")
      val tv = r.getDouble(3)
      assert(tv >= 0.0 && tv <= 1.0, s"$src tv range")
      assert(tv == num.toDouble / (2.0 * ns.toDouble * n.toDouble))
    }
  }

  test("rrf1: fused ranks are honest and the score is the stated two-term sum") {
    val rows = q("rrf1_rank_fusion").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ids = rows.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "doc_ids unique")
    var prev = Double.MaxValue
    for (r <- rows) {
      val rl = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val rv = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(rl.isDefined || rv.isDefined, "doc must come from a leg")
      rl.foreach(v => assert(v >= 1 && v <= 50))
      rv.foreach(v => assert(v >= 1 && v <= 50))
      val expect = rl.map(v => 1.0 / (60 + v)).getOrElse(0.0) +
        rv.map(v => 1.0 / (60 + v)).getOrElse(0.0)
      assert(r.getDouble(3) == expect, "rrf score replay")
      assert(r.getDouble(3) <= prev, "descending fusion order")
      prev = r.getDouble(3)
    }
  }

  test("shap1: efficiency axiom — credits sum to v(full) − v(empty)") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("ts_sec"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val convTs = ev.filter(_._2 == "purchase").groupBy(_._1).view
      .mapValues(_.map(_._3).minBy(_.getTime)).toMap
    val vFull = convTs.size.toLong
    val vEmpty = convTs.count { case (u, t) =>
      !ev.exists(e => e._1 == u && e._2 != "purchase" &&
        e._3.getTime < t.getTime)
    }.toLong
    val rows = q("shap1_shapley_attribution").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("click", "error", "signup", "view"))
    val sumPhi24 = rows.map(_.getLong(1)).sum
    assert(sumPhi24 == 24L * (vFull - vEmpty),
      s"efficiency: Σphi24=$sumPhi24 vs 24·(v(C)−v(∅))=${24L * (vFull - vEmpty)}")
    for (r <- rows)
      assert(r.getDouble(2) == r.getLong(1).toDouble / 24.0, "phi = phi24/24")
  }

  test("ams1: true F2 is exact and the sketch replays from first principles") {
    val counts = Tables.documents(spark, sf0001)
      .select(explode(TextAnalysis.words(col("text"))).as("t"))
      .where(col("t") =!= "")
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val f2True = counts.values.map(c => c * c).sum
    // replay all 80 estimators with the JVM's own md5
    val groupSums = (0 until 80).map { j =>
      val s = counts.iterator.map { case (t, c) =>
        (1L - 2L * (md5Hash60(s"ams:$j:$t") % 2L)) * c
      }.sum
      (j / 16, s * s)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val med = groupSums.toSeq.sortBy(x => (x._2, x._1)).apply(2)._2 / 16
    val r = q("ams1_f2_sketch").collect().head
    assert(r.getLong(0) == f2True, "true F2")
    assert(r.getLong(1) == med, "median-of-means sketch replay")
  }

  test("dr1: detection never exceeds truth and buckets respect the threshold") {
    val rows = q("dr1_dedup_recall").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val jb = r.getLong(0); val nTrue = r.getLong(1); val nDet = r.getLong(2)
      assert(jb >= 14 && jb <= 20, "jaccard >= 0.7 implies ventile >= 14")
      assert(nDet >= 0 && nDet <= nTrue, "recall census is a subset count")
    }
  }
}
