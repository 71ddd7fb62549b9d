#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the same source tables, and
compares schema + row multiset EXACTLY (column order normalized by name).
Exact comparison is deliberately stricter than any plausible driver hash.
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    # datetime / date / pandas Timestamp -> canonical string, so sorting by
    # repr is stable across the two readers' object types
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        spark_tbl = pq.read_table(f"{out_dir}/{name}")
        if name not in oracle:
            ok = spark_tbl.num_rows > 0
            print(f"{'ROWS-ONLY ok' if ok else 'ROWS-ONLY EMPTY'}  {name} "
                  f"({spark_tbl.num_rows} rows)")
            n_rowsonly += 1
            if not ok:
                n_fail += 1
            continue
        try:
            duck = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        scols = sorted(spark_tbl.column_names)
        dcols = sorted(duck.column_names)
        if scols != dcols:
            print(f"FAIL {name}: columns differ spark={scols} duck={dcols}")
            n_fail += 1
            continue
        # DuckDB sums BIGINT into DECIMAL(38,0)/HUGEINT (and Spark decimal
        # accumulators can leak out uncast). Python == coerces
        # Decimal(5) == 5 so a value compare passes, but the driver hashes
        # dtypes and flags a mismatch (round-2: e1/e3/t6/t10). Require BOTH
        # sides to CAST such columns to BIGINT/DOUBLE explicitly.
        dec = [(side, f.name)
               for side, tbl in (("oracle", duck), ("spark", spark_tbl))
               for f in tbl.schema if str(f.type).startswith("decimal")]
        if dec:
            print(f"FAIL {name}: DECIMAL-typed column(s) {dec} — "
                  f"add an explicit cast to BIGINT/DOUBLE")
            n_fail += 1
            continue
        sp = spark_tbl.select(scols).to_pylist()
        du = duck.select(dcols).to_pylist()
        sp = sorted((tuple(norm(r[c]) for c in scols) for r in sp), key=repr)
        du = sorted((tuple(norm(r[c]) for c in dcols) for r in du), key=repr)
        if len(sp) != len(du):
            print(f"FAIL {name}: rows spark={len(sp)} duck={len(du)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sp, du) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sp)} rows differ; first: "
                  f"spark={bad[0][0]} duck={bad[0][1]}")
            n_fail += 1
            continue
        print(f"MATCH {name} ({len(sp)} rows)")
        n_pass += 1
    print(f"\n== {n_pass} match, {n_rowsonly} rows-only, {n_fail} FAIL "
          f"(of {len(names)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
