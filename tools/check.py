#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
parquet tables, and compares: schema (column names), row count, and values
(columns sorted by name, rows sorted by all columns). Exits nonzero on any
mismatch. Dev-only tooling — NOT part of the shipped library.
"""
import json, os, sys
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dir (ScaledFixture output)
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    failures = 0
    for name in names:
        got = canon(con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        if name not in oracle:
            print(f"  {name:28s} rows={len(got):>7}  (no oracle — rows-only)")
            continue
        exp = canon(con.execute(oracle[name]).df())
        status = []
        if list(got.columns) != list(exp.columns):
            status.append(f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}")
        elif len(got) != len(exp):
            status.append(f"ROWS got={len(got)} exp={len(exp)}")
        else:
            # Mirror the driver's type-sensitive hashing: an int column on one
            # side vs float/object on the other (e.g. DuckDB HUGEINT -> float64)
            # must FAIL even when the values compare equal numerically.
            # (datetime RESOLUTION diffs — ns vs us — share kind 'M' and
            # never reach this branch, so no exemption is needed)
            for c in got.columns:
                gk, ek = got[c].dtype.kind, exp[c].dtype.kind
                if gk != ek:
                    status.append(f"DTYPE col {c}: got={got[c].dtype} exp={exp[c].dtype}")
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                              check_exact=True)
            except AssertionError as e:
                status.append("VALUES " + str(e).splitlines()[0])
                # show first differing rows for debugging
                for c in got.columns:
                    if not got[c].equals(exp[c]):
                        neq = got[c] != exp[c]
                        # NaN == NaN handling
                        both_na = got[c].isna() & exp[c].isna()
                        neq = neq & ~both_na
                        if neq.any():
                            i = neq.idxmax()
                            status.append(f"  col {c} row {i}: got={got[c][i]!r} exp={exp[c][i]!r}")
        if status:
            failures += 1
            print(f"  {name:28s} FAIL  " + " | ".join(status))
        else:
            print(f"  {name:28s} OK    rows={len(got)}")
    missing = set(oracle) - set(names)
    if missing:
        failures += 1
        print(f"  MISSING RESULTS for oracles: {sorted(missing)}")
    print(("PASS" if failures == 0 else f"FAIL ({failures})"))
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
