#!/usr/bin/env python3
"""Local replica of the driver's correctness gate:
run `graft.Verify <sfDir> <outDir>` first, then this script compares each
query's parquet dump against the DuckDB oracle (columns sorted by name,
rows sorted, strict exact value compare — floats must be bit-identical,
which both sides guarantee by rounding/decimal-summing; on mismatch the
per-column detail shows the differing values so a 1-ulp drift is visible).

Usage: python3 tools/check.py <sfDir> <outDir> [qName,qName,...]
(the optional third arg restricts the compare to those queries — the
SPARK_GRAFT_ONLY iteration loop; without it every oracle runs)
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, con, sf_dir, out_dir):
    try:
        oracle = con.sql(ORACLES[name]).fetchall()
        ocols = [d[0] for d in con.sql(ORACLES[name]).description]
    except Exception as e:
        return f"ORACLE-ERROR {type(e).__name__}: {e}"
    try:
        spark = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
        scols = [d[0] for d in
                 con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet' LIMIT 0").description]
    except Exception as e:
        return f"SPARK-READ-ERROR {type(e).__name__}: {e}"
    if sorted(ocols) != sorted(scols):
        return f"SCHEMA-MISMATCH oracle={sorted(ocols)} spark={sorted(scols)}"
    # The driver's hash path is stricter than Python-int equality: a
    # HUGEINT/DECIMAL oracle column (e.g. DuckDB sum() over BIGINT)
    # round-trips through its dataframe layer as float/object and
    # hash-mismatches an int64 Spark column even when every value is
    # equal. Surface those types here so the local gate catches them.
    otypes = [str(t) for t in con.sql(ORACLES[name]).types]
    widened = [f"{c}:{t}" for c, t in zip(ocols, otypes)
               if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")]
    if widened:
        return f"ORACLE-TYPE-WIDENED (cast to BIGINT/DOUBLE): {widened}"
    # reorder both to sorted column order
    oidx = [ocols.index(c) for c in sorted(ocols)]
    sidx = [scols.index(c) for c in sorted(scols)]
    orows = sorted([tuple(norm_cell(r[i]) for i in oidx) for r in oracle],
                   key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    srows = sorted([tuple(norm_cell(r[i]) for i in sidx) for r in spark],
                   key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    if len(orows) != len(srows):
        return f"ROWCOUNT oracle={len(orows)} spark={len(srows)}"
    for i, (o, s) in enumerate(zip(orows, srows)):
        if o != s:
            detail = []
            for c, (a, b) in zip(sorted(ocols), zip(o, s)):
                if a != b:
                    detail.append(f"{c}: oracle={a!r} spark={b!r}")
            return f"VALUE-MISMATCH row {i}: " + "; ".join(detail[:4])
    return f"OK ({len(srows)} rows)"


if __name__ == "__main__":
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        ORACLES = json.load(f)
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        ORACLES = {k: v for k, v in ORACLES.items() if k in only}
    failures = 0
    for name in sorted(ORACLES):
        res = compare(name, con, sf_dir, out_dir)
        status = "PASS" if res.startswith("OK") else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"[{status}] {name}: {res}")
    print(f"\n{len(ORACLES) - failures}/{len(ORACLES)} queries match")
    sys.exit(1 if failures else 0)
