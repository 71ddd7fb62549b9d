package graft.queries

import graft.Tables
import graft.operators.{DataQuality, GraphOps, Relevance, TimeSeries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 continuation surface: corpus/table audit, robust anomaly
  * detection, exact EWMA, graph census over co-occurrence structure, and
  * BM25-style relevance ranking. Every query is DuckDB-oracle-gated; the
  * float rules are the established ones (exact BIGINT wherever possible,
  * 2^20 quantization + identical expression shape for the one double
  * division that remains).
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Data-quality audit: completeness / uniqueness / validity / referential
    // integrity in one conditional-aggregate pass + one broadcast anti-join.
    "dq1_quality_audit" -> { (spark, dir) =>
      DataQuality.auditOrders(Tables.orders(spark, dir), Tables.customer(spark, dir))
    },

    // Robust anomaly detection: IQR fences from discrete rank-selected
    // quartiles over the quantized value — all-BIGINT decision.
    "ts3_anomaly" -> { (spark, dir) =>
      TimeSeries.iqrOutliers(Tables.events(spark, dir)).orderBy("event_id")
    },

    // Exact EWMA (α=1/2, 16-row span) as integer num/den pairs — the
    // sequential recurrence recast as a bounded explode + one aggregate.
    "ts4_ewma" -> { (spark, dir) =>
      TimeSeries.ewmaExact(Tables.events(spark, dir)).orderBy("event_id")
    },

    // Graph census over the top-40 term co-occurrence graph: nodes, edges,
    // wedges, triangles, quantized clustering coefficient.
    "tri1_triangle_census" -> { (spark, dir) =>
      GraphOps.triangleCensus(
        GraphOps.termCooccurrenceEdges(Tables.documentsParallel(spark, dir),
          topK = 40, minCo = 5L))
    },

    // BM25-style relevance top-20 for a fixed query term set.
    "bm1_bm25_topk" -> { (spark, dir) =>
      Relevance.bm25TopK(Tables.documentsParallel(spark, dir),
        Seq("spark", "join", "vector", "stream"), k = 20)
    },
  )

  val oracles: Map[String, String] = Map(

    "dq1_quality_audit" ->
      """WITH one_pass AS (
        |  SELECT COUNT(*) AS n_rows,
        |    COUNT(*) - COUNT(o_orderdate) AS n_null_date,
        |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_dup_pk,
        |    COUNT(DISTINCT o_custkey) AS n_distinct_cust,
        |    SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
        |      AS n_bad_status,
        |    SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS n_nonpos_total
        |  FROM orders
        |), orphans AS (
        |  SELECT COUNT(*) AS n_orphan_cust FROM orders
        |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |)
        |SELECT u.metric, u.value FROM one_pass, orphans,
        |  LATERAL (VALUES
        |    ('n_rows', CAST(n_rows AS BIGINT)),
        |    ('n_null_date', CAST(n_null_date AS BIGINT)),
        |    ('n_dup_pk', CAST(n_dup_pk AS BIGINT)),
        |    ('n_distinct_cust', CAST(n_distinct_cust AS BIGINT)),
        |    ('n_bad_status', CAST(n_bad_status AS BIGINT)),
        |    ('n_nonpos_total', CAST(n_nonpos_total AS BIGINT)),
        |    ('n_orphan_cust', CAST(n_orphan_cust AS BIGINT))
        |  ) AS u(metric, value)
        |ORDER BY metric""".stripMargin,

    "ts3_anomaly" ->
      """WITH ranked AS (
        |  SELECT event_id, event_type,
        |    CAST(floor(value * 1048576.0) AS BIGINT) AS q,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY CAST(floor(value * 1048576.0) AS BIGINT),
        |                                event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events
        |), bounds AS (
        |  SELECT event_type,
        |    MIN(CASE WHEN rn = (25 * n + 99) // 100 THEN q END) AS q1,
        |    MIN(CASE WHEN rn = (75 * n + 99) // 100 THEN q END) AS q3
        |  FROM ranked GROUP BY 1
        |)
        |SELECT r.event_id, r.event_type, r.q,
        |  b.q1 - 3 * (b.q3 - b.q1) AS lo, b.q3 + 3 * (b.q3 - b.q1) AS hi
        |FROM ranked r JOIN bounds b USING (event_type)
        |WHERE r.q < b.q1 - 3 * (b.q3 - b.q1) OR r.q > b.q3 + 3 * (b.q3 - b.q1)
        |ORDER BY event_id""".stripMargin,

    "ts4_ewma" ->
      """WITH ranked AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(value * 1048576.0) AS BIGINT) AS q,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY date_trunc('second', ts), event_id) AS rn
        |  FROM events
        |), contrib AS (
        |  SELECT user_id, rn + g.d AS rn,
        |    CAST(SUM(q * (CAST(1 AS BIGINT) << (15 - g.d))) AS BIGINT) AS ewma_num,
        |    CAST(SUM(CAST(1 AS BIGINT) << (15 - g.d)) AS BIGINT) AS ewma_den
        |  FROM ranked, UNNEST(generate_series(0, 15)) AS g(d)
        |  GROUP BY 1, 2
        |)
        |SELECT r.user_id, r.event_id, c.ewma_num, c.ewma_den
        |FROM ranked r JOIN contrib c ON c.user_id = r.user_id AND c.rn = r.rn
        |ORDER BY event_id""".stripMargin,

    "tri1_triangle_census" ->
      """WITH toks AS (
        |  SELECT doc_id, u.term
        |  FROM documents,
        |    UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS u(term)
        |  WHERE u.term <> ''
        |), top AS (
        |  SELECT term FROM toks GROUP BY 1
        |  ORDER BY COUNT(*) DESC, term LIMIT 40
        |), dt AS (
        |  SELECT DISTINCT doc_id, term FROM toks
        |  WHERE term IN (SELECT term FROM top)
        |), edges AS (
        |  SELECT a.term AS ta, b.term AS tb
        |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5
        |), deg AS (
        |  SELECT v, COUNT(*) AS deg FROM (
        |    SELECT ta AS v FROM edges UNION ALL SELECT tb AS v FROM edges
        |  ) GROUP BY 1
        |), census AS (
        |  SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
        |    (SELECT COUNT(*) FROM edges) AS n_edges,
        |    (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
        |    (SELECT COUNT(*)
        |     FROM edges e1
        |     JOIN edges e2 ON e2.ta = e1.tb
        |     JOIN edges e3 ON e3.ta = e1.ta AND e3.tb = e2.tb) AS n_triangles
        |)
        |SELECT n_nodes, n_edges, n_wedges, n_triangles,
        |  CASE WHEN n_wedges > 0 THEN
        |    CAST(floor(3.0 * n_triangles / n_wedges * 1048576.0) AS BIGINT)
        |  END AS clustering_q
        |FROM census""".stripMargin,

    "bm1_bm25_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, u.term
        |  FROM documents,
        |    UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS u(term)
        |  WHERE u.term <> ''
        |), dl AS (
        |  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
        |), corpus AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |    CAST(SUM(dl) AS DOUBLE) AS sum_dl FROM dl
        |), qtf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
        |  WHERE term IN ('spark', 'join', 'vector', 'stream') GROUP BY 1, 2
        |), df AS (
        |  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM qtf GROUP BY 1
        |), scored AS (
        |  SELECT qtf.doc_id,
        |    CAST(floor(
        |      ((corpus.n_docs - df.df + 0.5) / (df.df + 0.5)) *
        |      ((CAST(qtf.tf AS DOUBLE) * 2.2) /
        |       (CAST(qtf.tf AS DOUBLE) + 1.2 *
        |        (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) * corpus.n_docs / corpus.sum_dl))))
        |      * 1048576.0) AS BIGINT) AS score_term_q
        |  FROM qtf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus
        |)
        |SELECT doc_id, COUNT(*) AS n_hits,
        |  CAST(SUM(score_term_q) AS BIGINT) AS score_q
        |FROM scored GROUP BY 1
        |ORDER BY score_q DESC, doc_id LIMIT 20""".stripMargin,
  )
}
