#!/usr/bin/env python3
"""Battery-wide output-dtype hash-safety lint (round 9, VERDICT r8 #2).

The driver's correctness gate hashes the engine frame (Spark parquet) and
the oracle frame (DuckDB result) after a canonicalization step that is
FRAGILE for some dtypes: DECIMAL columns can hash red on value
distribution alone (trailing-zero canonicalization — r7 q_qr3, r8
q_a10/q_s11, all value-exact yet red), and DuckDB widens SUM(BIGINT) to
HUGEINT, which lands float64 in the driver's frame while Spark emits
int64 (r8 q_g1/q_t22: `123.0` vs `123` under hashing). A value-diff
checker like check_oracle.py structurally cannot see this class — values
compare equal where the hash differs. This lint closes the hole at the
SCHEMA level:

  for every battery query:
    engine side:  DESCRIBE SELECT * FROM read_parquet(<verify output>)
    oracle side:  DESCRIBE <oracle sql>        (plan-only, never executed
                                                — quadratic oracles lint
                                                in milliseconds)
  FAIL if either side declares DECIMAL or HUGEINT anywhere, or if a
  column's dtype CLASS (int / float / str / bool / date / timestamp /
  nested) differs between the two sides.

Class notes, calibrated against driver behavior observed over r7/r8:
  - int width differences (Spark INT vs DuckDB BIGINT rank columns) are
    driver-green → classes, not exact types, are compared.
  - DuckDB JSON renders as str in the driver frame → JSON ≡ VARCHAR.
  - int-vs-float IS red (the q_g1 class) → int and float are distinct.

Usage:
  python3 scripts/hash_lint.py <sfDir> <verifyOutDir>   # lint the battery
  python3 scripts/hash_lint.py --selftest               # prove the lint
                                                        # catches seeded
                                                        # fragile schemas

Exit 0 = every query hash-safe; 1 = violations (printed).
"""
import json, sys, glob, os, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def dtype_class(t):
    """Map a DuckDB type name to its hash-equivalence class, or a
    FRAGILE:* marker for types banned outright."""
    t = t.upper()
    if t.startswith("DECIMAL") or t == "HUGEINT" or t == "UHUGEINT":
        return "FRAGILE:" + t
    if t in INT_TYPES:
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t in ("VARCHAR", "JSON", "UUID"):
        return "str"
    if t == "BLOB":
        return "binary"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP") or t.startswith("TIME"):
        return "timestamp"
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        # nested columns hash structurally; inner fragile types still ban
        if "DECIMAL" in t or "HUGEINT" in t:
            return "FRAGILE:" + t
        return "nested"
    return "other:" + t


def lint_schemas(engine, oracle):
    """Compare two {col: duckdb_type} schemas; return violation strings."""
    out = []
    if sorted(engine) != sorted(oracle):
        return [f"column sets differ: {sorted(engine)} vs {sorted(oracle)}"]
    for c in sorted(engine):
        ka, kb = dtype_class(engine[c]), dtype_class(oracle[c])
        if ka.startswith("FRAGILE"):
            out.append(f"{c}: engine emits hash-fragile {engine[c]}")
        if kb.startswith("FRAGILE"):
            out.append(f"{c}: oracle emits hash-fragile {oracle[c]}")
        if not ka.startswith("FRAGILE") and not kb.startswith("FRAGILE") \
                and ka != kb:
            out.append(f"{c}: dtype class {engine[c]}({ka}) vs "
                       f"{oracle[c]}({kb})")
    return out


def describe(con, sql):
    return {r[0]: r[1] for r in con.sql("DESCRIBE " + sql).fetchall()}


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(oracle):
        spark_glob = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not spark_glob:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            eng = describe(con, f"SELECT * FROM read_parquet({spark_glob!r})")
            ora = describe(con, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: describe error: {e}"); n_bad += 1; continue
        v = lint_schemas(eng, ora)
        if v:
            n_bad += 1
            for msg in v:
                print(f"FAIL {name}: {msg}")
        else:
            print(f"OK   {name}")
    print(f"\nhash-safety lint: {len(oracle) - n_bad} safe, {n_bad} fragile")
    return 1 if n_bad else 0


def selftest():
    """Seeded fragile schemas MUST fail; a safe pair MUST pass."""
    con = duckdb.connect()
    # 1. seeded DECIMAL on the oracle side
    ora = describe(con, "SELECT CAST(1.23 AS DECIMAL(38,2)) AS total, 1 AS n")
    eng = describe(con, "SELECT CAST(1.23 AS DOUBLE) AS total, 1 AS n")
    assert any("hash-fragile DECIMAL(38,2)" in v
               for v in lint_schemas(eng, ora)), "seeded DECIMAL not caught"
    # 2. seeded DECIMAL on the engine side
    assert any("hash-fragile" in v for v in lint_schemas(ora, eng)), \
        "engine-side DECIMAL not caught"
    # 3. HUGEINT widening (the q_g1/q_t22 class)
    ora = describe(con, "SELECT SUM(x) AS s FROM (SELECT 5::BIGINT AS x)")
    eng = describe(con, "SELECT 5::BIGINT AS s")
    assert any("HUGEINT" in v for v in lint_schemas(eng, ora)), \
        "HUGEINT widening not caught"
    # 4. int-vs-float class mismatch (driver-red even when values equal)
    ora = describe(con, "SELECT 5.0::DOUBLE AS s")
    assert any("dtype class" in v for v in lint_schemas(eng, ora)), \
        "int-vs-float not caught"
    # 5. int WIDTH difference is driver-tolerated → must pass
    ora = describe(con, "SELECT 5::INTEGER AS s")
    assert lint_schemas(eng, ora) == [], "int width must be tolerated"
    # 6. JSON ≡ VARCHAR (q_p1/q_x6, driver-green)
    eng = describe(con, "SELECT '{}'::VARCHAR AS j")
    ora = describe(con, "SELECT to_json({a: 1}) AS j")
    assert lint_schemas(eng, ora) == [], "JSON must class as str"
    # 7. clean identical pair passes
    sql = "SELECT 'x' AS a, 1::BIGINT AS b, 1.5::DOUBLE AS c, DATE '2020-01-01' AS d"
    assert lint_schemas(describe(con, sql), describe(con, sql)) == []
    print("hash_lint selftest: all 7 cases passed")
    return 0


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
