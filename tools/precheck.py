#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the
engine itself is pure Scala/Spark).

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`:
    python3 tools/precheck.py /root/testdata/sf0.01 /tmp/verify_out
Compares each <name>/ parquet dump against DuckDB running oracle_sql.json,
sorting columns by name and rows by all columns before hashing values.
"""
import sys, json, glob, os, re
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# --- dtype gate -----------------------------------------------------------
# The driver hashes canonical string renderings, so a dtype difference that
# changes the rendering (DuckDB HUGEINT -> pandas float64 -> "5.0" vs Spark
# BIGINT -> "5") fails the driver even when check_dtype=False passes here.
# Map both sides' declared types into "render classes" and require equality;
# HUGEINT deliberately maps to its own class so an un-CAST DuckDB integer
# SUM is a loud local failure (the text_rarity round-7 escape).

def duck_class(t) -> str:
    s = str(t).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s == "HUGEINT":
        return "hugeint(un-CAST DuckDB integer SUM?)"
    if s in ("FLOAT", "DOUBLE"):
        return "float"
    m = re.match(r"DECIMAL\((\d+),(\d+)\)", s)
    if m:
        return f"decimal(s={m.group(2)})"
    if s == "VARCHAR":
        return "str"
    if s == "BOOLEAN":
        return "bool"
    if s == "DATE":
        return "date"
    if s.startswith("TIMESTAMP"):
        return "ts"
    if s == "BLOB":
        return "bytes"
    if s in ('"NULL"', "NULL", "SQLNULL"):
        return "*"  # projected-null columns match anything
    if s.endswith("[]") or s.startswith(("STRUCT", "MAP", "LIST", "UNION")):
        return "nested"
    return s

def arrow_class(t) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal(s={t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_null(t):
        return "*"
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_struct(t) or pa.types.is_map(t)):
        return "nested"
    return str(t)

def dtype_mismatches(spark_schema: pa.Schema, duck_cols, duck_types):
    spark = {f.name: arrow_class(f.type) for f in spark_schema}
    out = []
    for col, dt in zip(duck_cols, duck_types):
        dc = duck_class(dt)
        sc = spark.get(col)
        if sc is None or dc == "*" or sc == "*" or dc == sc:
            continue
        out.append(f"{col}: spark={sc} duckdb={dc}")
    return out

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver testdata ships single files; ScaleUp's sf1 tables are
        # Spark directories (x.parquet/part-*.parquet) — glob either
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
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
            rel = con.sql(oracles[name])
            exp = rel.df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        if files:
            # gate EVERY part file's schema, not just the first: Spark
            # writes are uniform, but a stale/mixed dump dir must not
            # slip a drifting dtype past the gate on file order. Key by
            # the LOGICAL field list (name, type) — not to_string(),
            # which drags writer metadata in — and read each footer once.
            schemas = {}
            for f in files:
                sch = pq.read_schema(f)
                schemas.setdefault(tuple((fld.name, str(fld.type)) for fld in sch), sch)
            bad = sorted({m for sch in schemas.values()
                          for m in dtype_mismatches(sch, rel.columns, rel.types)})
            if len(schemas) > 1:
                bad.append(f"{len(schemas)} distinct part-file schemas in dump dir")
            if bad:
                print(f"FAIL      {name}: dtype {'; '.join(bad)}")
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
