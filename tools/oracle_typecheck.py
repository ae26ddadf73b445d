#!/usr/bin/env python3
"""Mechanical oracle-vs-engine TYPE audit (the cu3/HUGEINT lesson).

The value-level gate (tools/check.py) canonicalizes through Python
`str()`, which renders a DuckDB HUGEINT and a Spark BIGINT identically
— so an oracle whose terminal SELECT exports a raw SUM(...) (HUGEINT
in DuckDB) passes locally yet hash-reds in the driver, whose
canonicalizer is type-sensitive. Four r9 gates (c2/t11/t11b/t13) went
red exactly this way. This lint makes the lesson mechanical: for every
oracle, DESCRIBE the query in DuckDB and compare each column's type
against the Spark parquet schema Verify dumped. Any skew — HUGEINT vs
BIGINT, DECIMAL vs DOUBLE, INT32 vs INT64 — fails loudly BEFORE the
driver ever sees it.

Usage: python3 tools/oracle_typecheck.py [sfDir] [verifyOutDir]
Requires a prior `sbt "runMain graft.Verify <sfDir> <outDir>"`.
"""
import sys, os, json, glob

import duckdb
import pyarrow.parquet as pq

# DuckDB type -> the pyarrow type names it canonicalizes identically to.
# Anything NOT in the allowed set for the DuckDB type is a finding.
COMPAT = {
    "BIGINT": {"int64"},
    "INTEGER": {"int32"},
    "SMALLINT": {"int16"},
    "TINYINT": {"int8"},
    "UBIGINT": {"uint64"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string", "large_string"},
    "BOOLEAN": {"bool"},
    "DATE": {"date32[day]"},
    "BLOB": {"binary", "large_binary"},
    "TIMESTAMP": {"timestamp[us]", "timestamp[ns]", "timestamp[us, tz=UTC]"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp[us, tz=UTC]"},
    # HUGEINT deliberately ABSENT: a HUGEINT column is always a finding
    # (cast the oracle's terminal SUM to BIGINT; DuckDB SUM(BIGINT)
    # returns int128 and the driver renders it unlike int64).
}


def arrow_name(t):
    return str(t)


def duck_cols(con, sql):
    return [(r[0], r[1]) for r in con.sql(f"DESCRIBE {sql}").fetchall()]


def check(sf, out):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    findings, n_ok, n_skip = [], 0, 0
    for name in sorted(oracle):
        parts = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not parts:
            n_skip += 1
            continue
        spark_types = {}
        for f in parts:
            for fld in pq.read_schema(f):
                spark_types[fld.name.lower()] = arrow_name(fld.type)
        try:
            ocols = duck_cols(con, f"({oracle[name]})")
        except Exception as e:
            findings.append((name, "<query>",
                             f"DESCRIBE failed: {type(e).__name__}: "
                             f"{str(e).splitlines()[0]}"))
            continue
        for cname, dtype in ocols:
            dt = dtype.upper()
            st = spark_types.get(cname.lower())
            if st is None:
                findings.append((name, cname,
                                 f"oracle column absent on Spark side "
                                 f"(duck={dt})"))
                continue
            if dt.startswith("DECIMAL"):
                # exact decimal compare only if Spark side is the SAME
                # decimal; decimal-vs-double renders differently
                if not st.startswith("decimal"):
                    findings.append((name, cname,
                                     f"duck={dt} vs spark={st} — cast "
                                     "the oracle column to the engine "
                                     "type (DOUBLE or BIGINT)"))
                continue
            allowed = COMPAT.get(dt)
            if allowed is None:
                findings.append((name, cname,
                                 f"duck={dt} vs spark={st} — type has "
                                 "no canonical-safe mapping; cast it "
                                 "(HUGEINT => CAST(... AS BIGINT))"))
            elif st not in allowed:
                findings.append((name, cname,
                                 f"duck={dt} vs spark={st}"))
        n_ok += 1
    for name, c, msg in findings:
        print(f"FAIL {name}.{c}: {msg}")
    print(f"\n{n_ok} oracles described, {n_skip} without parquet output, "
          f"{len(findings)} type findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(check(sf, out))
