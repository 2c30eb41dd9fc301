#!/usr/bin/env python3
"""Determinism double-check: value-compare two graft.Verify output dirs.

Usage: python3 tools/determinism.py /tmp/verify01 /tmp/verify01b

For every <name>.parquet present in BOTH dirs, runs DuckDB
`EXCEPT ALL` in both directions (bag semantics — catches row count,
value, and duplicate-multiplicity drift; column order is normalized by
selecting the sorted column list). Exit 0 iff every query is
bit-identical as a bag of rows.
"""
import sys, glob, os
import duckdb

def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    names = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(a_dir, "q*"))
        if os.path.isdir(p))
    missing = [n for n in names
               if not os.path.isdir(os.path.join(b_dir, n))]
    if missing:
        print(f"MISSING in {b_dir}: {missing}")
        return 1
    con = duckdb.connect()
    fails = 0
    for n in names:
        pa = os.path.join(a_dir, n)
        pb = os.path.join(b_dir, n)
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{pa}/*.parquet')").fetchall()]
        collist = ", ".join(f'"{c}"' for c in sorted(cols))
        diff = con.execute(
            f"SELECT count(*) FROM ("
            f"  (SELECT {collist} FROM read_parquet('{pa}/*.parquet')"
            f"   EXCEPT ALL"
            f"   SELECT {collist} FROM read_parquet('{pb}/*.parquet'))"
            f"  UNION ALL"
            f"  (SELECT {collist} FROM read_parquet('{pb}/*.parquet')"
            f"   EXCEPT ALL"
            f"   SELECT {collist} FROM read_parquet('{pa}/*.parquet')))"
        ).fetchone()[0]
        if diff:
            fails += 1
            print(f"DIFF {n}: {diff} asymmetric rows")
        else:
            print(f"SAME {n}")
    print(f"\n{len(names) - fails} identical, {fails} differ")
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main())
