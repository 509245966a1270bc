#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, and compares: schema (column names), row
count, and values (columns sorted by name, rows in result order, floats
compared exactly after stringification — mirroring a hash compare).
"""
import json, sys, math
import duckdb

class NonScalarCell(Exception):
    pass

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 / 17.0 vs 17 style differences
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if isinstance(v, (list, tuple, dict)):
        # the real driver loads results into pandas and sort_values
        # crashes (lexsort_indexer) on list/struct cells — mirror that
        # as a hard failure so array-typed outputs can't silently pass
        # locally while erroring in the driver's gate
        raise NonScalarCell(type(v).__name__)
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # the driver pandas-loads EVERY output (even rows-only no_oracle
    # queries) — any list/struct-typed column crashes its sort. Scan all
    # output dirs for non-scalar schemas up front.
    import os
    failed = set()
    for name in sorted(os.listdir(out_dir)):
        p = f"{out_dir}/{name}"
        if not os.path.isdir(p):
            continue
        try:
            types = con.sql(f"DESCRIBE SELECT * FROM '{p}/*.parquet'").fetchall()
        except Exception as e:
            print(f"FAIL {name}: unreadable output ({e})")
            n_fail += 1
            failed.add(name)
            continue
        bad = [(c, t) for c, t, *_ in types
               if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST"))]
        if bad:
            print(f"FAIL {name}: non-scalar output columns {bad}")
            n_fail += 1
            failed.add(name)
    for name, sql in sorted(oracle.items()):
        if name in failed:
            continue  # already counted in the schema scan
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = [[canon(r[got.columns.index(c)]) for c in got_cols]
                        for r in got.fetchall()]
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = [[canon(r[exp.columns.index(c)]) for c in exp_cols]
                        for r in exp.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols {got_cols} != {exp_cols}")
            n_fail += 1
        elif len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            n_fail += 1
        elif got_rows != exp_rows:
            bad = next(i for i, (a, b) in enumerate(zip(got_rows, exp_rows))
                       if a != b)
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"  got {got_rows[bad]}")
            print(f"  exp {exp_rows[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
