#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB against the same
parquet tables, and compares: row count, column-name set, and a hash of
the value matrix with columns sorted by name and rows sorted by value.
"""
import json, sys, hashlib
import duckdb
import pandas as pd
import glob
import math

def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        # No float->int normalization: the driver hashes dtype-faithfully,
        # so a DuckDB HUGEINT surfacing as float64 ("727.0") must FAIL here
        # exactly as it fails there (oracle SQL needs an explicit BIGINT cast).
        if isinstance(v, float):
            return repr(v)
        if hasattr(v, "isoformat"):
            s = v.isoformat()
            return s
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(rows), list(df.columns), h, rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gn, gc, gh, gr = canon(got)
        en, ec, eh, er = canon(exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs {ec}"); n_fail += 1
        elif gn != en:
            print(f"FAIL {name}: rows {gn} vs {en}"); n_fail += 1
        elif gh != eh:
            bad = next((i, a, b) for i, (a, b) in enumerate(zip(gr, er)) if a != b)
            print(f"FAIL {name}: hash mismatch; first diff row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({gn} rows)"); n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
