#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfdir> <verify_outdir>

Reads <verify_outdir>/<name>/ (Spark parquet) and oracle_sql.json, runs each
oracle SQL in DuckDB with the sf tables registered as views, and compares:
row count, column names (sorted), RESULT TYPES (Arrow schema — the driver's
hash is type-sensitive, so DuckDB HUGEINT vs Spark BIGINT must FAIL here
even when the printed values are identical), and cell values (sorted rows,
columns in name order, floats rounded to 6 significant decimals).
"""
import json, math, sys

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
# The heavy unrolled-CTE oracles (ta_bpe_*) OOM DuckDB at sf0.1 under the
# default all-cores config (32 threads x per-thread buffers exhaust the
# allocator: "Failed to allocate block" at tiny sizes); 8 threads + an
# explicit limit + a spill dir outside the repo (the default spilled 51 GB
# into ./.tmp) runs the same oracle in ~30s.
con.execute("SET threads=8")
con.execute("SET memory_limit='48GB'")
con.execute("SET temp_directory='/tmp/graft_duck_spill'")
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

# Local-iteration filter (mirrors Verify/Bench; the driver never sets it).
# A filtered run is NOT the full gate — the summary line is tagged so it
# can never be mistaken for one.
only = None
import os as _os
if _os.environ.get("SPARK_GRAFT_ONLY"):
    only = set(_os.environ["SPARK_GRAFT_ONLY"].split(","))
    oracle = {k: v for k, v in oracle.items() if k in only}

# Registry completeness gate (ADVICE r6): every DECLARED query must have a
# readable result, oracle-checked or not — a Spark-side failure that drops a
# result directory must fail the gate, never shrink the denominator.
import os
registry_fails = []
try:
    declared = json.load(open(f"{outdir}/queries.json"))
except FileNotFoundError:
    # Verify always writes queries.json; its absence means a stale/partial
    # outdir — exactly the silent-denominator-shrink scenario this gate
    # exists to prevent. Hard fail.
    sys.exit(f"FAIL: no queries.json in {outdir} — stale outdir or Verify "
             "did not complete; rerun graft.Verify")
# Queries allowed to be rows-only (engine-specific by design, behavior
# pinned in specs instead — SURVEY.md §4). Any OTHER declared query
# lacking an oracle entry is a forgotten oracleSql registration: FAIL,
# don't silently weaken the check.
ROWS_ONLY_BY_DESIGN = {"q13_sketch", "zs_webmercator"}
if only is not None:
    declared = [n for n in declared if n in only]
for name in declared:
    if name not in oracle and name not in ROWS_ONLY_BY_DESIGN:
        registry_fails.append(name)
        print(f"FAIL {name}: declared without an oracleSql entry and not in "
              f"the pinned rows-only set {sorted(ROWS_ONLY_BY_DESIGN)}")
        continue
    d = f"{outdir}/{name}"
    ok = os.path.isdir(d) and any(f.endswith(".parquet") for f in os.listdir(d))
    if ok and name not in oracle:
        # rows-only query: still require the result to be readable + nonempty
        try:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            ok = n > 0
            if ok:
                print(f"ok   {name} (rows-only, {n} rows)")
        except Exception as e:
            print(f"FAIL {name}: rows-only result unreadable: {e}")
            ok = False
    if not ok:
        registry_fails.append(name)
        print(f"FAIL {name}: declared but result missing/empty in {outdir}")

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if v is None:
        return ""
    return str(v)

# Compare Arrow logical type CLASSES, calibrated to the driver's observed
# sensitivity (CORRECTNESS_r01): int32 vs int64 hash identically (row_number
# queries passed), but DuckDB HUGEINT exports as decimal128(38,0) and formats
# differently from an int — that's the class that caused round-1's 10
# failures, so it must FAIL here too.
def type_class(t):
    s = str(t)
    if s.startswith(("int", "uint")):
        return "int"
    if s.startswith(("string", "large_string")):
        return "string"
    return s

def arrow_types(rel):
    tbl = rel.fetch_arrow_table()
    return {f.name: type_class(f.type) for f in tbl.schema}

fails = []
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        duck_rel = con.sql(sql)
        scols, dcols = sorted(spark_rel.columns), sorted(duck_rel.columns)
        if scols != dcols:
            fails.append(name)
            print(f"FAIL {name}: cols spark={scols} duck={dcols}")
            continue
        stypes, dtypes = arrow_types(spark_rel), arrow_types(duck_rel)
        badtypes = {c: (stypes[c], dtypes[c]) for c in scols if stypes[c] != dtypes[c]}
        if badtypes:
            fails.append(name)
            print(f"FAIL {name}: type mismatch (spark, duck): {badtypes}")
            continue
        s_rows = sorted(tuple(norm(v) for v in row) for row in
                        spark_rel.select(", ".join(f'"{c}"' for c in scols)).fetchall())
        d_rows = sorted(tuple(norm(v) for v in row) for row in
                        duck_rel.select(", ".join(f'"{c}"' for c in dcols)).fetchall())
        if s_rows != d_rows:
            fails.append(name)
            diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b]
            print(f"FAIL {name}: {len(s_rows)} vs {len(d_rows)} rows, "
                  f"first diffs: {diff[:3]}")
        else:
            print(f"ok   {name} ({len(s_rows)} rows)")
    except Exception as e:
        fails.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")

fails += registry_fails
total = len(set(declared) | set(oracle))
tag = " (FILTERED — not the full gate)" if only is not None else ""
print(f"\n{total - len(set(fails))}/{total} pass{tag}")
sys.exit(1 if fails else 0)
