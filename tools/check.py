#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran (or run it
with --run). For each <outDir>/<name> parquet dir with an entry in
oracle_sql.json: run the SQL in DuckDB with the sf tables registered as
views, sort columns by name, sort rows, and compare values exactly.
Queries without oracle SQL get a rows>0 check.
"""
import sys, os, json, glob, math, subprocess

import duckdb

def canon(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    rr.append("NaN")
                else:
                    rr.append(repr(v))
            else:
                rr.append(str(v))
        out.append(tuple(rr))
    out.sort()
    return out

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
                       cwd="/root/repo", check=True)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = {}
    names = sorted([os.path.basename(p) for p in glob.glob(f"{out}/*")
                    if os.path.isdir(p)])
    import pyarrow as pa
    import pyarrow.parquet as pq
    for name in names:
        try:
            # Read the Spark side via pyarrow->python objects (like the
            # driver), NOT via duckdb — so Decimal-vs-float / hugeint repr
            # skew is caught. Read EVERY part file (a query can emit more
            # than one), and record ERR instead of crashing the whole run
            # when a query left nothing behind.
            parts = sorted(glob.glob(f"{out}/{name}/*.parquet"))
            if not parts:
                results[name] = "ERR: no parquet part files"
                continue
            tbl = pa.concat_tables([pq.read_table(p) for p in parts],
                                   promote_options="default")
            scols = sorted(tbl.column_names)
            s_rows = list(zip(*[tbl.column(c).to_pylist() for c in scols])) \
                if scols else []
        except Exception as e:
            results[name] = f"ERR: {f'{type(e).__name__}: {e}'.splitlines()[0]}"
            continue
        if name not in oracle:
            results[name] = "ROWS_OK" if len(s_rows) > 0 else "ROWS_EMPTY"
            continue
        try:
            ora = con.sql(oracle[name])
            ocols = sorted(ora.columns)
            oq = ','.join('"%s"' % c for c in ocols)
            o_rows = con.sql(
                f"SELECT {oq} FROM ora").fetchall()
        except Exception as e:
            results[name] = \
                f"ORACLE_SQL_ERROR: {f'{type(e).__name__}: {e}'.splitlines()[0]}"
            continue
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            results[name] = f"SCHEMA_MISMATCH spark={scols} oracle={ocols}"
            continue
        cs, co = canon(s_rows), canon(o_rows)
        if len(cs) != len(co):
            results[name] = f"ROWCOUNT spark={len(cs)} oracle={len(co)}"
        elif cs != co:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(cs, co))
                        if a != b)
            results[name] = f"HASH_MISMATCH first_diff_row={diff[0]} " \
                            f"spark={diff[1]} oracle={diff[2]}"
        else:
            results[name] = f"OK rows={len(cs)}"
    npass = sum(1 for v in results.values()
                if v.startswith("OK") or v == "ROWS_OK")
    for k in sorted(results):
        print(f"{'PASS' if results[k].startswith(('OK','ROWS_OK')) else 'FAIL':4} {k}: {results[k]}")
    print(f"\n{npass}/{len(results)} pass")
    sys.exit(0 if npass == len(results) else 1)

main()
