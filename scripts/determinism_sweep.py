#!/usr/bin/env python3
"""Corpus-wide determinism sweep (r12 gate, scripted in r13): diff two
graft.Verify output dirs query by query, row-set-exactly, in DuckDB.

Usage: python3 scripts/determinism_sweep.py <outDirA> <outDirB>

The two dirs come from Verify runs at different parallelism (the
established protocol: SPARK_GRAFT_CPUS=7 vs 32) on the SAME sf dir. A
query passes iff the symmetric EXCEPT ALL in both directions is empty —
bag semantics, order-insensitive, exact on every cell. Any asymmetry
prints the query and the first few differing rows.
"""
import glob
import os
import sys

import duckdb


def main(dir_a, dir_b):
    con = duckdb.connect()
    # Union the query names from BOTH dirs (ADVICE r13): enumerating
    # only dir_a would silently skip a query present only in dir_b and
    # report all-pass despite asymmetric coverage.
    names = sorted(
        {os.path.basename(p) for p in glob.glob(f"{dir_a}/q_*")}
        | {os.path.basename(p) for p in glob.glob(f"{dir_b}/q_*")})
    n_pass = n_fail = 0
    for name in names:
        ga = sorted(glob.glob(f"{dir_a}/{name}/*.parquet"))
        gb = sorted(glob.glob(f"{dir_b}/{name}/*.parquet"))
        if not ga or not gb:
            print(f"FAIL {name}: missing output ({len(ga)} vs {len(gb)})")
            n_fail += 1
            continue
        try:
            diff = con.sql(
                f"(SELECT * FROM read_parquet({ga!r}) EXCEPT ALL "
                f" SELECT * FROM read_parquet({gb!r})) UNION ALL "
                f"(SELECT * FROM read_parquet({gb!r}) EXCEPT ALL "
                f" SELECT * FROM read_parquet({ga!r}))").fetchmany(4)
        except Exception as e:  # schema mismatch is also a failure
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if diff:
            print(f"FAIL {name}: row sets differ, e.g. {diff[:2]}")
            n_fail += 1
        else:
            n_pass += 1
    print(f"\ndeterminism sweep: {n_pass} identical, {n_fail} differing")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
