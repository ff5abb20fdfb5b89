#!/usr/bin/env python3
"""Dev-only harness mirror: compare graft.Verify parquet dumps against the
DuckDB oracle SQL, the way the driver's correctness gate does (sort columns
by name, sort rows, compare values). Run:

    SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_sf001"
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_sf001

Not part of the shipped library (driver-side python only)."""
import json
import math
import sys

import duckdb

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def table_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    import os
    # optional resource caps for big-SF sweeps (DuckDB's default is 80%
    # of RAM, which OOM-kills the process when a Spark JVM shares the
    # box); unset = driver-compatible defaults
    if os.environ.get("GRAFT_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # driver testdata ships single-file tables; Spark-written scale
        # dirs (e.g. ScaleGen output) are directories of part files
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        # a typo'd name must fail loudly, not produce a vacuous
        # "0 pass / 0 fail" green (the Verify/Bench ONLY-knob contract)
        only = {n.strip() for n in only}
        unknown = only - set(oracles)
        if unknown:
            print(f"FAIL: names not in oracle_sql.json: {sorted(unknown)}")
            return 1
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_types = dict(zip(got.columns, (str(t) for t in got.types)))
            got_cols, got_rows = got.columns, got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            want = con.sql(sql)
            want_types = dict(zip(want.columns, (str(t) for t in want.types)))
            want_cols, want_rows = want.columns, want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # dtype lint: the DRIVER compares through pandas, where a
        # DuckDB type wider than the Spark output's parquet type
        # materializes differently (HUGEINT -> float64 hashed '0.0'
        # vs int64 '0' -- the round-14 rel_compaction_plan red).
        # fetchall() is dtype-blind, so value equality below would
        # never catch this class; assert result types match instead.
        bad_types = sorted(
            f"{c}: spark={got_types[c]} oracle={want_types[c]}"
            for c in set(got_types) & set(want_types)
            if got_types[c] != want_types[c])
        if bad_types:
            print(f"FAIL {name}: oracle dtype drift (pandas hash hazard): "
                  + "; ".join(bad_types))
            n_fail += 1
            continue
        gc, gr = table_key(got_cols, got_rows)
        wc, wr = table_key(want_cols, want_rows)
        if gc != wc:
            print(f"FAIL {name}: columns spark={gc} oracle={wc}")
            n_fail += 1
            continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows spark={len(gr)} oracle={len(wr)}")
            n_fail += 1
            continue
        if gr != wr:
            bad = next(i for i in range(len(gr)) if gr[i] != wr[i])
            print(f"FAIL {name}: values differ at sorted row {bad}:")
            print(f"   spark : {gr[bad]}")
            print(f"   oracle: {wr[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(gr)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
