#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sfDir
tables, and compares: row count, column set, and exact values (columns
sorted by name, rows sorted by all columns).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pq.read_table(files).to_pandas()

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    passed, failed = [], []
    for name, sql in sorted(oracle.items()):
        got = load_spark(outdir, name)
        if got is None:
            failed.append((name, "no spark output"))
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            failed.append((name, f"oracle error: {e}"))
            continue
        if len(got) != len(exp):
            failed.append((name, f"rows spark={len(got)} duckdb={len(exp)}"))
            continue
        if sorted(got.columns) != sorted(exp.columns):
            failed.append((name, f"cols spark={sorted(got.columns)} duckdb={sorted(exp.columns)}"))
            continue
        g, e = normalize(got), normalize(exp)
        # exact compare on string repr (mirrors a value-hash)
        mism = []
        def canon(s):
            def one(v):
                try:
                    if pd.isna(v):
                        return "NULL"
                except (TypeError, ValueError):
                    pass
                r = str(v)
                # pandas renders a DATE column from duckdb as midnight
                # datetimes; canonicalize so DATE == DATE across engines
                return r[:-9] if r.endswith(" 00:00:00") else r
            return s.map(one)
        for c in g.columns:
            gs, es = canon(g[c]), canon(e[c])
            bad = gs != es
            if bad.any():
                i = bad.idxmax()
                mism.append(f"{c}[{i}]: spark={gs[i]!r} duckdb={es[i]!r}")
        if mism:
            failed.append((name, "; ".join(mism[:3])))
        else:
            passed.append(name)
    for n in passed:
        print(f"PASS {n}")
    for n, why in failed:
        print(f"FAIL {n}: {why}")
    print(f"\n{len(passed)}/{len(passed)+len(failed)} passed")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
