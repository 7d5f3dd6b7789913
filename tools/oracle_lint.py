#!/usr/bin/env python3
"""Oracle-dtype regression guard (dev tool — the shipped library does not
depend on this). Runs every SparkEntry.oracleSql under DuckDB and fails on
any top-level result column whose dtype the driver's hash canonicalization
serializes differently from Spark's:

  * HUGEINT / UHUGEINT (INT128) — DuckDB returns these from SUM over any
    integer type and from some integer window aggregates; pandas converts
    them to float64/object, so the driver hashes `10194974.0` against
    Spark's `10194974`. This cost rounds 4 AND 5 (q87 + 30 more red rows).
  * DECIMAL — flagged unless the Spark twin also emits decimal; pass
    --verify-out to cross-check kinds against the Verify parquet dump,
    otherwise DECIMAL is reported as a warning only.

Usage:
  sbt "runMain graft.OracleDump /tmp/oracle"
  python3 tools/oracle_lint.py /tmp/oracle/oracle_sql.json /root/testdata/sf0.001 [--verify-out DIR]

Exit code 0 = clean, 1 = violations found.
"""
import json, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BAD = ("HUGEINT", "UHUGEINT")


def spark_kinds(verify_out, name):
    """Column->kind ('i'nt/'f'loat/other) from the Verify parquet dump."""
    import glob
    import pyarrow.parquet as pq
    files = sorted(glob.glob(f"{verify_out}/{name}/*.parquet"))
    if not files:
        return None
    schema = pq.read_schema(files[0])
    kinds = {}
    for field in schema:
        t = str(field.type)
        if t.startswith(("int", "uint")):
            kinds[field.name] = "i"
        elif t in ("float", "double", "halffloat"):
            kinds[field.name] = "f"
        elif t.startswith("decimal"):
            kinds[field.name] = "d"
        else:
            kinds[field.name] = "o"
    return kinds


def main():
    sql_path, sf_dir = sys.argv[1], sys.argv[2]
    verify_out = None
    if "--verify-out" in sys.argv:
        verify_out = sys.argv[sys.argv.index("--verify-out") + 1]
    oracles = json.load(open(sql_path))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_bad = n_warn = n_err = 0
    for name in sorted(oracles):
        try:
            rel = con.sql(oracles[name])
            cols, types = rel.columns, [str(t) for t in rel.types]
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_err += 1
            continue
        sk = spark_kinds(verify_out, name) if verify_out else None
        for c, t in zip(cols, types):
            if any(b in t for b in BAD):
                print(f"FAIL {name}.{c}: oracle dtype {t} (driver hash will "
                      f"mismatch Spark int64 — CAST the aggregate AS BIGINT)")
                n_bad += 1
            elif sk is not None and c in sk and sk[c] in "if":
                # generic numeric-kind cross-check: an int column on one
                # engine and a float on the other serializes differently
                # under the driver hash (`10.0` vs `10`)
                ok = ("INT" in t or t in ("BIGINT", "INTEGER", "SMALLINT",
                                          "TINYINT", "UBIGINT", "UINTEGER"))
                of = t in ("DOUBLE", "FLOAT", "REAL")
                if (sk[c] == "i" and of) or (sk[c] == "f" and ok):
                    print(f"WARN {name}.{c}: kind mismatch — oracle {t} vs "
                          f"Spark {'int' if sk[c] == 'i' else 'float'}")
                    n_warn += 1
            if t.startswith("DECIMAL"):
                kind = sk.get(c) if sk else None
                if kind == "f":
                    print(f"FAIL {name}.{c}: oracle DECIMAL vs Spark float "
                          f"(CAST the oracle column AS DOUBLE)")
                    n_bad += 1
                elif sk is None:
                    print(f"WARN {name}.{c}: oracle dtype {t} — fine only if "
                          f"the Spark twin emits decimal too")
                    n_warn += 1
    print(f"oracle_lint: {len(oracles)} queries, {n_bad} violations, "
          f"{n_warn} warnings, {n_err} errors")
    sys.exit(1 if (n_bad or n_err) else 0)


if __name__ == "__main__":
    main()
