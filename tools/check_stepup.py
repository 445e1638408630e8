#!/usr/bin/env python3
"""Per-query tranche driver for the step-up oracle certification.

The r11 close stalled twice on the 10x DuckDB check run as ONE process:
a handful of pathological oracles (recursive min-label closures, chained
tokenizer DP) can grind for CPU-hours at 10x and take the whole
certification down with them. This driver runs tools/check.py one query
at a time (fresh DuckDB process per query — no allocator creep, no
shared fate) with a per-query timeout, streams progress, and persists a
resumable results map, so the certification ALWAYS lands: every query
ends pass, fail, or timeout, and the timeouts can be re-adjudicated at a
smaller step factor (the judge-sanctioned 3x fallback) or a bigger
timeout without re-running the rest.

Usage: python3 tools/check_stepup.py <sfdir> <verify_outdir> [timeout_s]
           [only_csv] [shard_idx n_shards]

Writes <verify_outdir>/stepup_results.json incrementally; a rerun skips
queries already marked pass (delete the file for a clean slate).
Sharded runs (shard_idx/n_shards: interleaved i % n split so the heavy
oracles spread across shards) write stepup_results.shard<i>of<n>.json —
merge with tools/merge_stepup.py style one-liner or a rerun without
shards after copying passes in.
"""
import json
import os
import subprocess
import sys
import time

sfdir, outdir = sys.argv[1], sys.argv[2]
timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 900
only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 and sys.argv[4] else None
shard_idx, n_shards = (int(sys.argv[5]), int(sys.argv[6])) \
    if len(sys.argv) > 6 else (0, 1)

declared = json.load(open(f"{outdir}/queries.json"))
keys = sorted(k for k in declared if only is None or k in only)
keys = [k for i, k in enumerate(keys) if i % n_shards == shard_idx]

respath = f"{outdir}/stepup_results.json" if n_shards == 1 else \
    f"{outdir}/stepup_results.shard{shard_idx}of{n_shards}.json"
res = {}
if os.path.exists(respath):
    res = json.load(open(respath))

here = os.path.dirname(os.path.abspath(__file__))
for i, k in enumerate(keys):
    if res.get(k, {}).get("status") == "pass":
        continue
    t0 = time.time()
    env = dict(os.environ, SPARK_GRAFT_ONLY=k)
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(here, "check.py"), sfdir, outdir],
            capture_output=True, text=True, timeout=timeout, env=env)
        dt = round(time.time() - t0, 1)
        res[k] = {"status": "pass" if p.returncode == 0 else "fail", "sec": dt}
        if p.returncode != 0:
            res[k]["tail"] = p.stdout[-400:] + p.stderr[-200:]
    except subprocess.TimeoutExpired:
        res[k] = {"status": "timeout", "sec": timeout}
    print(f"[{i + 1}/{len(keys)}] {k}: {res[k]['status']} {res[k]['sec']}s",
          flush=True)
    json.dump(res, open(respath, "w"), indent=1)

done = [k for k in keys if k in res]
npass = sum(1 for k in done if res[k]["status"] == "pass")
touts = [k for k in done if res[k]["status"] == "timeout"]
fails = [k for k in done if res[k]["status"] == "fail"]
print(f"\nSUMMARY {npass}/{len(done)} pass; timeouts={touts}; fails={fails}")
sys.exit(1 if (touts or fails) else 0)
