#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each <outDir>/<name>/ parquet against its DuckDB oracle from
<outDir>/oracle_sql.json, exactly: columns sorted by name, rows sorted,
values compared cell-for-cell (floats exact, to mimic hash compare).

Usage: python3 scripts/check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracle:
            print(f"  {name:<24} rows={len(got):>6}  (no oracle: rows-only check)")
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name:<24} ORACLE SQL ERROR: {str(e).splitlines()[0]}")
            failures += 1
            continue
        g, w = norm(got), norm(want)
        schema_ok = list(g.columns) == list(w.columns)
        rows_ok = len(g) == len(w)
        if schema_ok and rows_ok:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                              check_exact=True)
                print(f"✓ {name:<24} rows={len(g):>6}  exact match")
                continue
            except AssertionError as e:
                print(f"✗ {name:<24} VALUE MISMATCH")
                # show first differing cells
                diff_shown = 0
                for c in g.columns:
                    neq = ~(g[c].eq(w[c]) | (g[c].isna() & w[c].isna()))
                    if neq.any():
                        i = neq.idxmax()
                        print(f"    col={c} row={i}: got={g[c][i]!r} want={w[c][i]!r}")
                        diff_shown += 1
                        if diff_shown >= 4:
                            break
        else:
            print(f"✗ {name:<24} schema_ok={schema_ok} rows {len(g)} vs {len(w)}")
            if not schema_ok:
                print(f"    got  cols: {list(g.columns)}")
                print(f"    want cols: {list(w.columns)}")
        failures += 1
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(names)} queries)")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
