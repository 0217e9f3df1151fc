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


def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    # --json <path>: also write a CORRECTNESS_r*-schema artifact (one
    # entry per query: rows/schema/hash match + row counts + err), so
    # the repo carries machine-readable correctness evidence from the
    # local sweep — round 12's driver-side t2 produced an empty {} and
    # left the round ungradable from artifacts alone.
    report = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}
    # An oracle entry with no dump dir means the Spark side FAILED for that
    # query (Verify skips it) — a stale out_dir once masked exactly this.
    for name in sorted(set(oracle) - set(names)):
        print(f"FAIL {name}: oracle present but no spark dump (query failed?)")
        record(name, False, False, False, 0, None, "no spark dump")
        n_fail += 1
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            record(name, False, False, False, 0, None, "no spark output")
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
            record(name, False, False, False, len(got), None,
                   f"oracle SQL error: {e}")
            n_fail += 1
            continue
        schema_ok = sorted(got.columns) == sorted(exp.columns)
        rows_ok = len(got) == len(exp)
        hash_ok = False
        if not schema_ok:
            print(f"FAIL {name}: schema got={sorted(got.columns)} exp={sorted(exp.columns)}")
        elif not rows_ok:
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}")
        else:
            hg, rg = frame_hash(got)
            he, re_ = frame_hash(exp)
            hash_ok = hg == he
            if not hash_ok:
                diffs = [(a, b) for a, b in zip(rg, re_) if a != b][:3]
                print(f"FAIL {name}: hash mismatch; first diffs:")
                for a, b in diffs:
                    print(f"   got {a[:200]}\n   exp {b[:200]}")
        record(name, rows_ok, schema_ok, hash_ok, len(got), len(exp))
        if schema_ok and rows_ok and hash_ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(names)} total ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(sorted(report.items())), f, indent=1)
        print(f"wrote {json_out} ({len(report)} entries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    jout = None
    if "--json" in argv:
        i = argv.index("--json")
        jout = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1], jout))
