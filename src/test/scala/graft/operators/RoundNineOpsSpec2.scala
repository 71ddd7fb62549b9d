package graft.operators

import java.security.MessageDigest

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariant laws for the second wave of round-9 additions — the
  * properties the DuckDB oracle hash can't articulate. The two graph
  * replays (ast1/mod1) run at sf0.01, where the fixture graph is
  * non-degenerate at the queries' thresholds (sf0.001's 50 docs clear
  * neither minCo=20 nor the chain-edge Jaccard often enough); the
  * rest replay at sf0.001.
  */
class RoundNineOpsSpec2 extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private def q(name: String, dir: String = sf001) =
    SparkEntry.queries(name)(spark, dir)

  private def md5Hash60(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("ast1: moments and r replay from the collected edge list") {
    val edges = GraphOps.termCooccurrenceEdges(
        Tables.documents(spark, sf001), topK = 40, minCo = 20L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ends = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val m2 = ends.length.toLong
    val sx = ends.map(e => deg(e._1)).sum
    val sxy = ends.map(e => deg(e._1) * deg(e._2)).sum
    val sxx = ends.map(e => deg(e._1) * deg(e._1)).sum
    val r = q("ast1_degree_assortativity").collect().head
    assert(r.getLong(0) == m2)
    assert(r.getLong(1) == m2 * sxy - sx * sx, "num")
    assert(r.getLong(2) == m2 * sxx - sx * sx, "den")
    val rr = r.getDouble(3)
    assert(rr == (m2 * sxy - sx * sx).toDouble / (m2 * sxx - sx * sx).toDouble)
    assert(math.abs(rr) <= 1.0, "assortativity is a correlation")
  }

  test("mod1: q_num replays from labels+edges; modularity bounded") {
    val docs = Tables.documents(spark, sf001)
    val edges = Dedup.consecutiveBigramEdges(docs, minJaccard = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = GraphOps.minLabelRounds(
        docs.select(col("doc_id").as("v")),
        Dedup.consecutiveBigramEdges(docs, minJaccard = 0.05), k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = edges.length.toLong
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dc = labels.toSeq.groupBy(_._2).view
      .mapValues(_.map(v => deg.getOrElse(v._1, 0L)).sum).toMap
    val ec = edges.filter(e => labels(e._1) == labels(e._2))
      .groupBy(e => labels(e._1)).view.mapValues(_.length.toLong).toMap
    val qNum = dc.map { case (lab, d) =>
      4L * m * ec.getOrElse(lab, 0L) - d * d
    }.sum
    val r = q("mod1_community_modularity").collect().head
    assert(r.getLong(0) == dc.size.toLong, "n_communities")
    assert(r.getLong(1) == m, "edge count")
    assert(r.getLong(2) == qNum, "q_num replay")
    val mod = r.getDouble(3)
    assert(mod == qNum.toDouble / (4.0 * m.toDouble * m.toDouble))
    assert(mod >= -0.5 && mod <= 1.0, "Newman bound")
  }

  test("burst1: moments replay; B strictly inside (-1, 1)") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts div 1000000000").as("tsec"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gaps = ev.groupBy(e => (e._1, e._2)).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._4, e._3))
      sorted.sliding(2).collect {
        case Array(a, b) => (a._2, (b._4 - a._4) / 60)
      }
    }.toSeq
    val byType = gaps.groupBy(_._1)
    for (r <- q("burst1_burstiness", sf0001).collect()) {
      val g = byType(r.getString(0)).map(_._2)
      val (n, s, sq) = (g.length.toLong, g.sum, g.map(x => x * x).sum)
      assert(r.getLong(1) == n && r.getLong(2) == s && r.getLong(3) == sq,
        s"${r.getString(0)} moments")
      val rad = math.sqrt((n * sq - s * s).toDouble)
      assert(r.getDouble(4) == (rad - s) / (rad + s), "formula replay")
      assert(r.getDouble(4) > -1.0 && r.getDouble(4) < 1.0)
    }
  }

  test("j12: bucketed candidates reproduce the brute-force pair census") {
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byPrio = o.groupBy(_._2)
    val got = q("j12_band_join", sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((prio, os) <- byPrio) {
      var pairs = 0L; var exact = 0L
      for (i <- os.indices; j <- (i + 1) until os.length) {
        val (ka, _, ca) = os(i); val (kb, _, cb) = os(j)
        if (math.abs(ca - cb) <= 100L && ka != kb) {
          pairs += 1
          if (ca == cb) exact += 1
        }
      }
      val (gp, ge) = got.getOrElse(prio, (0L, 0L))
      assert(gp == pairs && ge == exact, s"$prio pairs/exact")
    }
  }

  test("qsk1: estimates are order statistics of the true bottom-k sample") {
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sample = o.map { case (k, c) => (md5Hash60(s"qsk:$k"), c) }
      .sortBy(identity).take(256).map(_._2).sorted
    val rows = q("qsk1_sample_quantiles", sf0001).collect()
    assert(rows.length == 2)
    for (r <- rows) {
      assert(r.getLong(1) == sample.length.toLong, "k_sample")
      def at(qq: Double) = sample(math.ceil(sample.length * qq).toInt - 1)
      assert(r.getLong(2) == at(0.25) && r.getLong(3) == at(0.5) &&
        r.getLong(4) == at(0.75) && r.getLong(5) == at(0.9),
        s"${r.getString(0)} order statistics")
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4) &&
        r.getLong(4) <= r.getLong(5), "monotone quantiles")
    }
    assert(rows(0).toSeq.drop(1) == rows(1).toSeq.drop(1),
      "merge law: per-priority bottom-k union re-sketches to the direct sketch")
  }

  test("imv2: the three delta terms + base partition the full join") {
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), (col("o_orderkey") % 5 === 4).as("dO"))
    val l = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), (col("l_linenumber") % 3 === 0).as("dL"))
    val all = o.join(l, col("o_orderkey") === col("l_orderkey"))
    val total = all.count()
    val parts = Seq((false, false), (true, false), (false, true), (true, true))
      .map { case (a, b) =>
        all.where(col("dO") === a && col("dL") === b).count()
      }
    assert(parts.sum == total, "disjoint cover")
    assert(parts.forall(_ > 0), "every delta term non-empty (the fixture cut)")
  }

  test("hell1: quantized BC within vocab/2^20 of the exact coefficient; bounds hold") {
    val toks = Tables.documents(spark, sf0001)
      .select(col("source"), explode(TextAnalysis.words(col("text"))).as("t"))
      .where(col("t") =!= "")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = toks.length.toLong
    val global = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    for (r <- q("hell1_hellinger_drift", sf0001).collect()) {
      val src = r.getString(0)
      val mine = toks.filter(_._1 == src).groupBy(_._2).view
        .mapValues(_.length.toLong).toMap
      val ns = mine.values.sum
      assert(r.getLong(1) == ns)
      val exactBc = mine.map { case (t, cs) =>
        math.sqrt((cs * global(t)).toDouble)
      }.sum / math.sqrt(ns.toDouble * n.toDouble)
      val gotBc = r.getLong(2).toDouble /
        (1048576.0 * math.sqrt(ns.toDouble * n.toDouble))
      // each term floors away < 2^-20; the sum misses < vocab_s/2^20
      val bound = mine.size.toDouble / 1048576.0 /
        math.sqrt(ns.toDouble * n.toDouble) + 1e-12
      assert(math.abs(exactBc - gotBc) <= bound,
        s"$src quantization error ${math.abs(exactBc - gotBc)} > $bound")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"$src hell2 range")
    }
  }

  test("csim1 + nov1: exact replays from the token relation") {
    val toks = Tables.documents(spark, sf0001)
      .select(col("source"), explode(TextAnalysis.words(col("text"))).as("t"))
      .where(col("t") =!= "")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val global = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = global.values.map(c => c * c).sum
    for (r <- q("csim1_source_profile_cosine", sf0001).collect()) {
      val mine = toks.filter(_._1 == r.getString(0)).groupBy(_._2).view
        .mapValues(_.length.toLong).toMap
      val dot = mine.map { case (t, cs) => cs * global(t) }.sum
      val ns2 = mine.values.map(c => c * c).sum
      assert(r.getLong(2) == dot, "dot")
      assert(r.getDouble(3) ==
        dot.toDouble / (math.sqrt(ns2.toDouble) * math.sqrt(nn.toDouble)))
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
    for (r <- q("nov1_ngram_novelty", sf0001).collect()) {
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(2) <= r.getLong(1), "novel is a subset of types")
    }
  }

  test("ml4 + jk1 + c4g1: formula replays and count sanity") {
    val mcc = q("ml4_mcc", sf0001).collect().head
    val (tp, fp, fn, tn) =
      (mcc.getLong(0), mcc.getLong(1), mcc.getLong(2), mcc.getLong(3))
    assert(mcc.getDouble(4) == (tp * tn - fp * fn).toDouble /
      math.sqrt((tp + fp).toDouble * (tp + fn).toDouble *
        (tn + fp).toDouble * (tn + fn).toDouble))
    assert(math.abs(mcc.getDouble(4)) <= 1.0)

    val docs = Tables.documents(spark, sf0001)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bigN = docs.length.toLong; val bigS = docs.map(_._2).sum
    for (r <- q("jk1_source_influence", sf0001).collect()) {
      val mine = docs.filter(_._1 == r.getString(0))
      val (ng, sg) = (mine.length.toLong, mine.map(_._2).sum)
      assert(r.getLong(1) == ng && r.getLong(2) == sg)
      val wo = (bigS - sg).toDouble / (bigN - ng).toDouble
      assert(r.getDouble(3) == wo, "mean_without replay")
      assert(r.getDouble(4) == wo - bigS.toDouble / bigN.toDouble)
    }

    for (r <- q("c4g1_c4_gate", sf0001).collect()) {
      val nd = r.getLong(1)
      assert(Seq(2, 3, 4, 5).forall(i => r.getLong(i) <= nd),
        "every rule count bounded by n_docs")
      assert(r.getLong(6) <= r.getLong(2),
        "pass requires the terminal-punctuation rule")
    }
  }
}
