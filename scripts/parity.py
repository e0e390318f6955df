#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables and compare to the Spark parquet dumped by
graft.Verify. Columns sorted by name, rows sorted, exact value compare
(with a small float tolerance fallback reported separately)."""
import sys, json, glob, os
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    pq = f"{out_dir}/{name}"
    files = glob.glob(f"{pq}/*.parquet")
    if not files:
        results[name] = "NO_SPARK_OUTPUT"
        continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {str(e)[:200]}"
        continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{pq}/*.parquet')").fetchdf()
    except Exception as e:
        results[name] = f"SPARK_READ_ERROR: {str(e)[:120]}"
        continue
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    # stringify unhashable (array/list) cells so pandas can sort
    for df in (exp, got):
        for c in df.columns:
            if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, tuple)) or \
               str(df[c].dtype) == 'object' and len(df) and type(df[c].iloc[0]).__name__ == 'ndarray':
                df[c] = df[c].astype(str)
    if list(exp.columns) != list(got.columns):
        results[name] = f"SCHEMA_MISMATCH exp={list(exp.columns)} got={list(got.columns)}"
        continue
    if len(exp) != len(got):
        results[name] = f"ROWCOUNT exp={len(exp)} got={len(got)}"
        continue
    exp_s = exp.sort_values(by=list(exp.columns), na_position="first").reset_index(drop=True)
    got_s = got.sort_values(by=list(got.columns), na_position="first").reset_index(drop=True)
    bad = []
    for c in exp.columns:
        e, g = exp_s[c], got_s[c]
        try:
            eq = (e == g) | (e.isna() & g.isna())
        except Exception:
            eq = e.astype(str) == g.astype(str)
        if not eq.all():
            nbad = int((~eq).sum())
            i = (~eq).idxmax()
            bad.append(f"{c}: {nbad} diffs, first exp={e[i]!r} got={g[i]!r} dtype exp={e.dtype} got={g.dtype}")
    results[name] = "OK rows=%d" % len(exp) if not bad else "VALUES: " + "; ".join(bad[:3])

ok = sum(1 for v in results.values() if v.startswith("OK"))
for k, v in results.items():
    print(("PASS " if v.startswith("OK") else "FAIL ") + k + " :: " + v)
print(f"\n{ok}/{len(results)} queries match")
