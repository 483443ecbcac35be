#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the
engine itself is pure Scala/Spark).

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`:
    python3 tools/precheck.py /root/testdata/sf0.01 /tmp/verify_out
Compares each <name>/ parquet dump against DuckDB running oracle_sql.json,
sorting columns by name and rows by all columns before hashing values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # Verify writes a manifest of the queries it actually dumped this
    # run; restrict to it so stale parquet from a prior run in a reused
    # outDir can't validate as fresh (pre-manifest dumps check all dirs)
    sel_path = os.path.join(out_dir, "selected.json")
    selected = set(json.load(open(sel_path))) if os.path.exists(sel_path) else None
    n_pass = n_fail = n_rows_only = 0
    skipped = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        if selected is not None and name not in selected:
            skipped += 1
            continue
        files = glob.glob(f"{path}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            ok = len(got) > 0
            n_rows_only += 1
            print(f"{'ROWS-OK' if ok else 'ROWS-EMPTY':9s} {name}: {len(got)} rows (no oracle)")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL      {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL      {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"PASS      {name}: {len(g)} rows")
            n_pass += 1
        except AssertionError as ex:
            print(f"FAIL      {name}: {str(ex).splitlines()[-1][:200]}")
            n_fail += 1
    extra = f" ({skipped} stale dirs outside this run's manifest skipped)" if skipped else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only{extra}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
