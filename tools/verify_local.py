#!/usr/bin/env python3
"""Local mirror of the driver's t2 DuckDB-oracle compare.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/verify_local.py <sfDir> <outDir>

For each <outDir>/<name> parquet result, runs the matching SQL from
<outDir>/oracle_sql.json in DuckDB over the sf-dir tables and compares
row count, schema (sorted col names), and a value hash (columns sorted
by name, rows sorted by all columns as strings).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, pd.Timestamp):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = ["|".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    return h, rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    # An oracle entry with no dump dir means the Spark side FAILED for that
    # query (Verify skips it) — a stale out_dir once masked exactly this.
    for name in sorted(set(oracle) - set(names)):
        print(f"FAIL {name}: oracle present but no spark dump (query failed?)")
        n_fail += 1
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: schema got={sorted(got.columns)} exp={sorted(exp.columns)}")
            ok = False
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}")
            ok = False
        else:
            hg, rg = frame_hash(got)
            he, re_ = frame_hash(exp)
            if hg != he:
                ok = False
                diffs = [(a, b) for a, b in zip(rg, re_) if a != b][:3]
                print(f"FAIL {name}: hash mismatch; first diffs:")
                for a, b in diffs:
                    print(f"   got {a[:200]}\n   exp {b[:200]}")
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(names)} total ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
