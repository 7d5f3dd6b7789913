#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped Scala library does not depend on this).

Usage: python3 tools/local_oracle.py <outDir> <sfDir>
  where <outDir> was produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For every query: load <outDir>/<name> parquet (Spark result), run the
oracle SQL from oracle_sql.json in DuckDB over the sf tables, sort
columns by name, sort rows, compare values cell-by-cell (exact for
ints/strings, bit-exact for floats), report match/mismatch.
"""
import json, sys, glob, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True,
                        na_position="first")
    return df

def cell_eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b): return True
        if pd.isna(a) or pd.isna(b): return False
    except (TypeError, ValueError):
        pass
    return a == b

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); n_fail += 1; continue
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            want = canon(con.sql(oracles[name]).df())
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
                n_fail += 1; continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
            bad = None
            for ci, c in enumerate(got.columns):
                gv, wv = got[c].tolist(), want[c].tolist()
                for ri in range(len(gv)):
                    if not cell_eq(gv[ri], wv[ri]):
                        bad = (c, ri, gv[ri], wv[ri]); break
                if bad: break
            if bad:
                c, ri, g, w = bad
                print(f"FAIL {name}: col={c} row={ri} spark={g!r} oracle={w!r}")
                # dtype hint
                print(f"     dtypes spark={got[c].dtype} oracle={want[c].dtype}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        nm = d.rstrip("/").split("/")[-1]
        if nm not in oracles:
            files = glob.glob(f"{d}/*.parquet")
            rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS {nm}: {rows}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
