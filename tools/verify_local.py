#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate.

Usage: tools/verify_local.py [sfDir] [outDir]
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` was already run.
Creates DuckDB views over the sf parquet tables, runs each oracle SQL,
and compares with the Spark-written parquet (columns sorted by name,
rows sorted, exact value equality).
"""
import duckdb, json, math, sys, os
from datetime import datetime, date
from decimal import Decimal

import pandas as pd
import pyarrow.parquet as pq


def driver_smoke(path, name):
    """Mirror the driver's failure modes seen in round 1:
    - pandas sort_values crashes on top-level list columns
      (TypeError: unhashable type: 'numpy.ndarray')
    - DECIMAL columns hash differently between Spark and DuckDB
    Returns a list of problems (empty = driver-safe output).
    """
    problems = []
    schema = pq.read_table(path).schema
    import pyarrow.types as pt
    for field in schema:
        t = field.type
        if pt.is_decimal(t):
            problems.append(f"column '{field.name}' is DECIMAL ({t}) — driver hash-fails; cast to DOUBLE")
        if pt.is_list(t) or pt.is_large_list(t) or pt.is_struct(t) or pt.is_map(t):
            problems.append(f"column '{field.name}' is nested ({t}) — driver pandas sort crashes; serialize with array_join/to_json")
    try:
        df = pd.read_parquet(path)
        df.sort_values(list(df.columns))
    except Exception as e:
        problems.append(f"pandas sort_values crashed: {type(e).__name__}: {e}")
    return problems

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out)

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
failures = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        res = con.execute(sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        failures += 1
        continue
    try:
        res2 = con.execute(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
        s_cols = [d[0] for d in res2.description]
        s_rows = res2.fetchall()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        failures += 1
        continue
    oc, orows = canon(o_cols, o_rows)
    sc, srows = canon(s_cols, s_rows)
    if oc != sc:
        print(f"FAIL {name}: schema mismatch oracle={oc} spark={sc}")
        failures += 1
        continue
    if orows != srows:
        print(f"FAIL {name}: rows differ (oracle={len(orows)}, spark={len(srows)})")
        for i, (a, b) in enumerate(zip(orows, srows)):
            if a != b:
                print(f"  first diff at row {i}:\n    oracle={a}\n    spark ={b}")
                break
        failures += 1
        continue
    smoke = driver_smoke(f"{OUT}/{name}", name)
    if smoke:
        for p in smoke:
            print(f"FAIL {name}: driver-unsafe output: {p}")
        failures += 1
        continue
    print(f"OK   {name}: {len(srows)} rows")

# rows-only queries (no oracle): check the parquet exists and has rows
for d in sorted(os.listdir(OUT)):
    path = os.path.join(OUT, d)
    if os.path.isdir(path) and d not in oracle:
        try:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{path}/*.parquet')").fetchone()[0]
            status = "OK  " if n > 0 else "WARN"
            print(f"{status} {d}: rows-only, {n} rows")
            if n == 0:
                failures += 1
        except Exception as e:
            print(f"FAIL {d}: unreadable: {e}")
            failures += 1

sys.exit(1 if failures else 0)
