#!/usr/bin/env python3
"""Local mirror of the driver's t2 duckdb-oracle check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching oracle
SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir parquet tables,
and compares row count, column names, and values (exact for ints/strings,
bit-exact for floats by default; reports max abs diff when not).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


INT_WIDTHS = __import__("re").compile(r"\b(TINYINT|SMALLINT|INTEGER|BIGINT)\b")


def norm_type(t):
    # HUGEINT deliberately NOT in the class: it is the driver-divergent one
    return INT_WIDTHS.sub("INT", t)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.sql(sql)
            exp_cols = [c.lower() for c in exp.columns]
            exp_rows = exp.fetchall()
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [c.lower() for c in got.columns]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        # Driver-parity lint: the driver's pandas compare sort_values()
        # crashes on array/map/struct cells (TypeError: unhashable
        # numpy.ndarray — round-1 q25, round-7 q119). This mirror used
        # to canonicalize lists fine, which is exactly how q119 shipped
        # red — so reject complex top-level columns here too.
        complex_cols = [
            (c, str(t)) for c, t in zip(got_cols, got.types)
            if any(k in str(t).upper() for k in ("[]", "LIST", "MAP(", "STRUCT("))]
        if complex_cols:
            print(f"FAIL {name}: top-level complex output column(s) "
                  f"{complex_cols} — the driver comparator cannot sort "
                  "array/map/struct cells; unwrap to scalars (q25) or "
                  "render to JSON (q53)")
            n_fail += 1
            continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols spark={got_cols} oracle={exp_cols}")
            n_fail += 1
            continue
        # align column order by name (driver sorts by name)
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        # Type-strict: the driver hashes a canonical serialization, so a
        # DuckDB HUGEINT vs Spark BIGINT is a driver hash-fail even when
        # every value matches (round-6 q90/q103/q105). Mirror the driver's
        # empirical tolerance: ints up to 64-bit all render identically in
        # its canonical form (q15/q22/q23/q32/q37/q52 were INTEGER-vs-
        # BIGINT and hash-green in r6), but HUGEINT converts differently.
        # So collapse sub-64-bit int widths into one class and compare the
        # rest of the type string strictly.
        exp_types = [norm_type(str(exp.types[j])) for j in eidx]
        got_types = [norm_type(str(got.types[j])) for j in gidx]
        if exp_types != got_types:
            diffs = [(sorted(exp_cols)[k], exp_types[k], got_types[k])
                     for k in range(len(exp_types))
                     if exp_types[k] != got_types[k]]
            print(f"FAIL {name}: type mismatch (oracle vs spark): {diffs}")
            n_fail += 1
            continue
        if len(exp_rows) != len(got_rows):
            print(f"FAIL {name}: rows spark={len(got_rows)} oracle={len(exp_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (er, gr) in enumerate(zip(exp_rows, got_rows)):
            ev = tuple(norm(er[j]) for j in eidx)
            gv = tuple(norm(gr[j]) for j in gidx)
            if ev != gv:
                bad = (i, ev, gv)
                break
        if bad:
            i, ev, gv = bad
            print(f"FAIL {name}: first diff at row {i}:")
            print(f"  oracle: {ev}")
            print(f"  spark : {gv}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
