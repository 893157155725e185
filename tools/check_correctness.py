#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
sf parquet tables, reads the Spark result parquet the same way the
driver does, sorts columns by name (the driver's documented compare),
sorts rows, and diffs values exactly.

Usage: python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out
(run `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"` first)
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        # Type-faithful gate: the driver hashes RENDERED values, so an
        # int64 Spark column vs a float64 oracle column (DuckDB HUGEINT
        # from an uncast SUM, DECIMAL from //, etc.) hash-mismatches even
        # when Python's == calls the values equal. Compare dtype kinds.
        KIND = {"i": "int", "u": "int", "f": "float", "b": "bool",
                "O": "obj", "M": "ts", "m": "td"}
        drift = [(c, str(got[c].dtype), str(want[c].dtype))
                 for c in got.columns
                 if KIND.get(got[c].dtype.kind, got[c].dtype.kind)
                 != KIND.get(want[c].dtype.kind, want[c].dtype.kind)]
        if drift:
            print(f"FAIL {name}: dtype drift (spark vs oracle): {drift}")
            n_fail += 1; continue
        g = sorted([tuple(norm(v) for v in r) for r in got.itertuples(index=False)])
        w = sorted([tuple(norm(v) for v in r) for r in want.itertuples(index=False)])
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_fail += 1; continue
        if g != w:
            bad = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1; continue
        print(f"PASS {name}: {len(g)} rows")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
