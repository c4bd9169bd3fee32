#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle on the same tables and diff exactly.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
(Dev-only tool; the shipped library is pure Scala/Spark.)
"""
import json, sys, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize value text per cell (Decimal vs float reprs differ)
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        return str(v)
    return df.map(cell)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (e.g. the ScaleUp output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):  # driver testdata: one file per table
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = con.execute(sql).df()
            got = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            w, g = norm(want), norm(got)
            ws = w.sort_values(by=list(w.columns)).reset_index(drop=True)
            gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
            if ws.equals(gs):
                print(f"PASS {name} ({len(gs)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: oracle {ws.shape} vs spark {gs.shape}")
                if list(ws.columns) != list(gs.columns):
                    print(f"  cols oracle={list(ws.columns)} spark={list(gs.columns)}")
                else:
                    neq = (ws != gs).any(axis=1)
                    print("  first diffs (oracle | spark):")
                    print(pd.concat([ws[neq].head(3), gs[neq].head(3)],
                                    keys=["oracle", "spark"]).to_string())
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
