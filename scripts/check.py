#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify output parquet,
run each oracle SQL in DuckDB over the same testdata dir, compare
(sorted columns, sorted rows, exact values). Usage:
  python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    # Exact representation: Decimal('0.2800') must NOT collapse to '0.28' —
    # the driver's hasher is representation-sensitive, so neither can we be.
    return str(v)

def frame(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    types = [str(d[1]) for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    types_sorted = [types[i] for i in order]
    data = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return cols_sorted, types_sorted, data

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # queries sharing one oracle text (d01-d03 Jaccard, d04/d05 embed)
    # compute it once
    oracle_cache = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(res_glob):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_cols, got_types, got = frame(con, f"SELECT * FROM '{res_glob}'")
            if sql not in oracle_cache:
                oracle_cache[sql] = frame(con, sql)
            want_cols, want_types, want = oracle_cache[sql]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
        elif got_types != want_types:
            print(f"FAIL {name}: column types {list(zip(got_cols, got_types))} "
                  f"!= {list(zip(want_cols, want_types))}")
            n_fail += 1
        elif got != want:
            diffs = [(a, b) for a, b in zip(got, want) if a != b][:3]
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}; first diffs: {diffs}")
            if len(got) != len(want):
                og = [r for r in got if r not in set(want)][:3]
                ow = [r for r in want if r not in set(got)][:3]
                print(f"  only-spark: {og}\n  only-oracle: {ow}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
