#!/usr/bin/env python3
"""Embedding-space skew census (VERDICT r10 #3) — the vector-side
analogue of skew_census.py: replays the engine's own deterministic
bucketings (label-centroid semantic clusters, x2's 4x4 LSH tables, x5's
16-centroid IVF lists, x34's md5 id-hash seed buckets) over a ScaleGen
embeddings tree and reports the occupancy / pair-work counters that
decide whether the ANN/dedup tiers stay corpus-linear under cluster
skew.

Usage: embedding_skew_census.py <treeDir> [...]
  e.g. embedding_skew_census.py .scale/sf1.0 .scale/sf1.0-clustered

(Generate the trees first:
  sbt "runMain graft.tools.ScaleGen .scale/sf1.0 /root/testdata/sf0.1 10"
  sbt "runMain graft.tools.ScaleGen .scale/sf1.0-clustered /root/testdata/sf0.1 10 clustered")
"""
import sys
import duckdb

# Label-mean centroid assignment (the sd2/e4 replay) -> cluster sizes and
# the within-cluster pair totals sd2 scores (sd3 sub-buckets each cluster
# by 4 LSH tables; its scored-pair total is the tbl sum below).
SEMANTIC = """
WITH terms AS (
  SELECT label, g.i - 1 AS dim,
    CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1048576.0) AS BIGINT) AS q
  FROM '{tree}/embeddings.parquet', UNNEST(generate_series(1, len(embedding))) AS g(i)
), cent AS (
  SELECT label, dim,
    CAST(floor(CAST(SUM(q) AS DOUBLE) / (COUNT(*) * 1048576.0)
      * 1048576.0) AS BIGINT) AS qc
  FROM terms GROUP BY 1, 2
), vq AS (
  SELECT vec_id, g.i - 1 AS dim,
    CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1048576.0) AS BIGINT) AS qv
  FROM '{tree}/embeddings.parquet', UNNEST(generate_series(1, len(embedding))) AS g(i)
), dists AS (
  SELECT v.vec_id, c.label,
    CAST(SUM((qv - qc) * (qv - qc)) AS BIGINT) AS qdist
  FROM vq v JOIN cent c ON c.dim = v.dim GROUP BY 1, 2
), assign AS (
  SELECT vec_id, label AS cluster FROM (
    SELECT vec_id, label, qdist,
      row_number() OVER (PARTITION BY vec_id ORDER BY qdist, label) AS rn
    FROM dists) t WHERE rn = 1
), sz AS (SELECT cluster, count(*) AS n FROM assign GROUP BY 1),
wts AS (
  SELECT p.p, d.d,
    ((CAST(1103515245 AS BIGINT) * (p.p * 64 + d.d) + 12345) % 2001 + 2001) % 2001 - 1000 AS w
  FROM UNNEST(generate_series(0, 15)) AS p(p),
       UNNEST(generate_series(0, 63)) AS d(d)
), dots AS (
  SELECT e.vec_id, w.p, SUM(e.qv * w.w) AS dot
  FROM vq e JOIN wts w ON w.d = e.dim
  GROUP BY 1, 2
), lsh AS (
  SELECT a.vec_id, a.cluster, CAST(d.p // 4 AS INTEGER) AS t,
    SUM(CASE WHEN d.dot > 0 THEN 1 << (d.p % 4) ELSE 0 END) AS b
  FROM assign a JOIN dots d ON d.vec_id = a.vec_id
  GROUP BY 1, 2, 3
), sub AS (
  SELECT cluster, t, b, count(*) AS n FROM lsh GROUP BY 1, 2, 3
)
SELECT
  (SELECT max(n) FROM sz) AS max_cluster,
  (SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) FROM sz) AS sd2_pairs,
  (SELECT max(n) FROM sub) AS max_subbucket,
  (SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) FROM sub) AS sd3_scored_pairs
"""

# x34's NN-descent seeding: 2 md5 families of expected-32 id-hash buckets
# over the vec_id < 500 slice — immune to embedding skew by construction
# (the census proves it: the bucket histogram is identical on every tree).
NND_SEEDS = """
WITH qe AS (SELECT vec_id FROM '{tree}/embeddings.parquet' WHERE vec_id < 500),
nbk AS (SELECT GREATEST(1, COUNT(*) // 32) AS nb FROM qe),
bkt AS (
  SELECT vec_id, fam.f AS fam,
    ('0x' || substr(md5('nnd' || CAST(fam.f AS VARCHAR) || ':' ||
      CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % nbk.nb AS b
  FROM qe, nbk, (SELECT UNNEST(generate_series(0, 1)) AS f) AS fam
), sz AS (SELECT fam, b, count(*) AS n FROM bkt GROUP BY 1, 2)
SELECT max(n) AS max_seed_bucket,
  count(*) FILTER (n BETWEEN 2 AND 64) AS ok_buckets,
  count(*) FILTER (n > 64) AS capped_buckets
FROM sz
"""

# x5's IVF: centroids = first 16 vectors by id, corpus assigned by
# quantized-cosine argmax (tie -> lowest centroid id) -> list occupancy.
IVF = """
WITH vq AS (
  SELECT vec_id, g.i - 1 AS dim,
    CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1048576.0) AS BIGINT) AS qv
  FROM '{tree}/embeddings.parquet', UNNEST(generate_series(1, len(embedding))) AS g(i)
), cent AS (
  SELECT vec_id AS centroid_id, dim, qv AS qc FROM vq
  WHERE vec_id IN (SELECT vec_id FROM '{tree}/embeddings.parquet' ORDER BY vec_id LIMIT 16)
), sims AS (
  SELECT v.vec_id, c.centroid_id,
    CAST(SUM(v.qv * c.qc) AS DOUBLE)
      / nullif(sqrt(CAST(SUM(v.qv * v.qv) AS DOUBLE))
             * sqrt(CAST(SUM(c.qc * c.qc) AS DOUBLE)), 0) AS sim
  FROM vq v JOIN cent c ON c.dim = v.dim GROUP BY 1, 2
), assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
    FROM sims) t WHERE rn = 1
), sz AS (SELECT centroid_id, count(*) AS n FROM assign GROUP BY 1)
SELECT max(n) AS max_list, CAST(avg(n) AS BIGINT) AS avg_list,
  count(*) AS n_lists FROM sz
"""

if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    con = duckdb.connect()
    for tree in sys.argv[1:]:
        sem = con.execute(SEMANTIC.format(tree=tree)).fetchone()
        nnd = con.execute(NND_SEEDS.format(tree=tree)).fetchone()
        ivf = con.execute(IVF.format(tree=tree)).fetchone()
        print(f"{tree}:")
        print(f"  semantic: max_cluster={sem[0]} sd2_pairs={sem[1]} "
              f"max_subbucket={sem[2]} sd3_scored_pairs={sem[3]}")
        print(f"  nnd_seeds(<500): max_seed_bucket={nnd[0]} "
              f"ok_buckets={nnd[1]} capped_buckets={nnd[2]}")
        print(f"  ivf16: max_list={ivf[0]} avg_list={ivf[1]} n_lists={ivf[2]}")
