#!/usr/bin/env python3
"""Reproduces SCALE.md's degeneracy-cap census (VERDICT r9 #4): the d2
MinHash banding replayed over a ScaleGen tree, reporting how many band
buckets exceed the [2, 64] gate and how many candidate pairs the cap
removes.

Usage: skew_census.py <treeDir> [...]
  e.g. skew_census.py .scale/sf1.0 .scale/sf1.0-zipf

(Generate the trees first:
  sbt "runMain graft.tools.ScaleGen .scale/sf1.0 /root/testdata/sf0.1 10"
  sbt "runMain graft.tools.ScaleGen .scale/sf1.0-zipf /root/testdata/sf0.1 10 zipf")
"""
import sys
import duckdb

CENSUS = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM '{tree}/documents.parquet'
), sh AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS s
  FROM toks WHERE len(w) >= 3
), hs AS (
  SELECT doc_id, CAST(g.i AS INTEGER) AS h_idx,
    ((g.i * 2 + 1) * 1103515245 % 2147483647
      * (('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647)
      + g.i) % 2147483647 AS h
  FROM sh, UNNEST(generate_series(0, 15)) AS g(i)
), sigs AS (
  SELECT doc_id, h_idx, min(h) AS mh FROM hs GROUP BY 1, 2
), bands AS (
  SELECT doc_id, h_idx // 4 AS b,
    ('0x' || substr(md5(string_agg(mh::VARCHAR, ',' ORDER BY h_idx)), 1, 15))::BIGINT AS key
  FROM sigs GROUP BY doc_id, h_idx // 4
), sz AS (
  SELECT b, key, count(*) AS n FROM bands GROUP BY 1, 2
)
SELECT count(*) FILTER (n BETWEEN 2 AND 64) AS ok_buckets,
  count(*) FILTER (n > 64) AS capped_buckets,
  coalesce(sum(n * (n - 1) / 2) FILTER (n BETWEEN 2 AND 64), 0) AS pairs_in,
  coalesce(sum(n * (n - 1) / 2) FILTER (n > 64), 0) AS pairs_capped_away,
  max(n) AS max_bucket
FROM sz
"""

if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    con = duckdb.connect()
    for tree in sys.argv[1:]:
        row = con.execute(CENSUS.format(tree=tree)).fetchone()
        ok, capped, p_in, p_cap, mx = row
        print(f"{tree}: ok_buckets={ok} capped_buckets={capped} "
              f"pairs_in={int(p_in)} pairs_capped_away={int(p_cap)} max_bucket={mx}")
