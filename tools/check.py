#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs graft.Verify output against DuckDB: for each <name>.parquet under
outDir, executes oracle_sql.json[name] over the sf parquet tables and
compares (schema-insensitively): columns sorted by name, rows sorted,
values hashed. Prints per-query PASS/FAIL.

Fidelity note: both sides are fetched via DuckDB's pandas bridge
(`.df()`) and row-sorted with `DataFrame.sort_values`, matching the
driver's comparator. This is deliberate — `fetchall()` silently
narrows HUGEINT to Python int and lists to tuples, which let two
driver-red shapes (HUGEINT-typed projections, array-typed output
columns) pass a weaker local gate in round 7. With the pandas path,
a HUGEINT column shows up as float64 ("21.0" vs "21") and an array
column makes sort_values throw — exactly like the driver.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, os, json, math, datetime
import duckdb
import numpy as np
import pandas as pd

def canon(df):
    # driver semantics: columns sorted by name, rows sorted via pandas,
    # then values stringified; floats via repr, tz-aware timestamps on
    # the UTC wall clock.
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    out = []
    for row in df.itertuples(index=False, name=None):
        vals = []
        for v in row:
            if isinstance(v, (float, np.floating)):
                v = "NaN" if math.isnan(v) else repr(float(v))
            elif isinstance(v, (int, np.integer)) and not isinstance(v, bool):
                v = str(int(v))
            elif isinstance(v, pd.Timestamp):
                if v.tzinfo is not None:
                    v = v.tz_convert("UTC").tz_localize(None)
                v = str(v.to_pydatetime())
            elif isinstance(v, datetime.datetime) and v.tzinfo is not None:
                v = str(v.astimezone(datetime.timezone.utc).replace(tzinfo=None))
            vals.append(str(v))
        out.append(tuple(vals))
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_skip = 0
    # a query that crashed in Verify leaves no result dir: that is a
    # FAIL, not a silent shrink of the gate
    for name in sorted(set(oracles) - set(names)):
        print(f"FAIL  {name}: declared oracle but no Verify output (query crashed?)")
        n_fail += 1
    for name in names:
        try:
            got_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            got = canon(got_df)
        except Exception as e:
            print(f"FAIL  {name}: spark-side canon error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle ({len(got)} rows)")
            n_skip += 1
            continue
        try:
            exp_df = con.sql(oracles[name]).df()
            exp = canon(exp_df)
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(got_df.columns) != sorted(exp_df.columns):
            print(f"FAIL  {name}: columns {sorted(got_df.columns)} != {sorted(exp_df.columns)}")
            n_fail += 1
        elif got == exp:
            print(f"PASS  {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {len(got)} rows vs {len(exp)} expected")
            diff = [(g, e) for g, e in zip(got, exp) if g != e][:3]
            for g, e in diff:
                print(f"      got {g}\n      exp {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
