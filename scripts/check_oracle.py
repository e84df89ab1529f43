#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet tables and diff.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [skip,names]

The optional third argument names queries to skip — used for sf0.1+
validation runs where a handful of ORACLES are quadratic (exhaustive
all-pairs / recursive-CTE formulations that DuckDB grinds on for tens of
minutes while the Spark side stays seconds); the skipped set still gates
at sf0.01 where the exhaustive oracle is affordable.
"""
import json, sys, glob, os, decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def pd_class(dt):
    """Hash-equivalence class of a pandas dtype (r9): int width differs
    between Spark INT and DuckDB BIGINT and is driver-tolerated, but
    int-vs-float (the q_g1 HUGEINT-widening class) is driver-RED even
    when values compare equal — so class mismatches FAIL, not WARN."""
    s = str(dt)
    if s.startswith(("int", "uint", "Int", "UInt")): return "int"
    if s.startswith(("float", "Float")): return "float"
    if s.startswith("bool"): return "bool"
    if s.startswith("datetime"): return "timestamp"
    return s  # object, category, … — compare exactly

def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if name in skip:
            print(f"SKIP {name}"); continue
        sql = oracle[name]
        spark_glob = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not spark_glob:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({spark_glob!r})").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            ok = False
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                if pd_class(a.dtype) != pd_class(b.dtype):
                    # driver-hash-red even when every value compares equal
                    print(f"FAIL {name}.{c}: dtype class {a.dtype} vs {b.dtype}")
                    ok = False
                if a.dtype == object:
                    # Decimal objects are the r7/r8 canonicalization trap
                    # whole-column scan (ADVICE r9): a head-only sniff
                    # would miss Decimals that first appear late; frames
                    # are already in memory so this is cheap at gate scale
                    dec = [s for s in (a, b)
                           if s.dropna().map(
                               lambda v: isinstance(v, decimal.Decimal)).any()]
                    if dec:
                        print(f"FAIL {name}.{c}: Decimal objects in frame "
                              f"(hash-fragile; emit cents/digit-strings)")
                        ok = False
                try:
                    eq = (a.fillna("__N") == b.fillna("__N")) if a.dtype == object \
                        else ((a == b) | (a.isna() & b.isna()))
                except Exception:
                    eq = a.astype(str) == b.astype(str)
                if not eq.all():
                    bad = (~eq).idxmax()
                    print(f"FAIL {name}.{c}: first diff row {bad}: "
                          f"spark={a[bad]!r} oracle={b[bad]!r} ({(~eq).sum()} diffs)")
                    ok = False
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
        else:
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    skips = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    sys.exit(main(sys.argv[1], sys.argv[2], skips))
