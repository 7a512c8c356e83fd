#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <verifyOutDir> <sfDir>

Loads each <outDir>/<name> parquet result, runs the matching oracle SQL
from <outDir>/oracle_sql.json in DuckDB (tables = views over the sfDir
parquet files), and compares: columns sorted by name, rows sorted by all
columns, exact value equality (with a report of near-miss floats).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1;  continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            exp = canon(con.execute(sql).df())
        except Exception as ex:
            print(f"FAIL {name}: {ex}");  n_fail += 1;  continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}")
            n_fail += 1;  continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
            n_fail += 1;  continue
        ok = True
        for c in got.columns:
            g, e = got[c].to_numpy(), exp[c].to_numpy()
            if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
                gf, ef = g.astype(np.float64), e.astype(np.float64)
                exact = np.array_equal(gf, ef, equal_nan=True)
                if not exact:
                    close = np.allclose(gf, ef, rtol=1e-9, atol=1e-9, equal_nan=True)
                    bad = np.where(~(np.isclose(gf, ef, rtol=1e-12, atol=1e-12) |
                                     (pd.isna(gf) & pd.isna(ef))))[0][:3]
                    print(f"FAIL {name}: col {c} float mismatch "
                          f"({'NEAR' if close else 'FAR'}) e.g. idx {bad.tolist()} "
                          f"spark={gf[bad].tolist()} duck={ef[bad].tolist()}")
                    ok = False
            else:
                if not np.array_equal(pd.isna(g), pd.isna(e)) or \
                   not all((pd.isna(a) and pd.isna(b)) or a == b for a, b in zip(g, e)):
                    bad = [i for i, (a, b) in enumerate(zip(g, e))
                           if not ((pd.isna(a) and pd.isna(b)) or a == b)][:3]
                    print(f"FAIL {name}: col {c} mismatch e.g. idx {bad} "
                          f"spark={[g[i] for i in bad]} duck={[e[i] for i in bad]}")
                    ok = False
        # dtype drift report (schema check)
        for c in got.columns:
            if got[c].dtype != exp[c].dtype:
                print(f"  note {name}: dtype {c} spark={got[c].dtype} duck={exp[c].dtype}")
        if ok:
            print(f"PASS {name} ({len(got)} rows)");  n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
