#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs graft.Verify output against DuckDB: for each <name>.parquet under
outDir, executes oracle_sql.json[name] over the sf parquet tables and
compares (schema-insensitively): columns sorted by name, rows sorted,
values hashed. Prints per-query PASS/FAIL.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, os, json, math, datetime
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows; normalize floats/timestamps
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            elif isinstance(v, datetime.datetime) and v.tzinfo is not None:
                # TIMESTAMPTZ vs naive TIMESTAMP: same instant, different
                # str(); compare on the UTC wall clock.
                v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
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
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got = canon(got_rel.fetchall(), got_rel.columns)
        if name not in oracles:
            print(f"SKIP  {name}: no oracle ({len(got)} rows)")
            n_skip += 1
            continue
        try:
            exp_rel = con.sql(oracles[name])
            exp = canon(exp_rel.fetchall(), exp_rel.columns)
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(got_rel.columns) != sorted(exp_rel.columns):
            print(f"FAIL  {name}: columns {sorted(got_rel.columns)} != {sorted(exp_rel.columns)}")
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
