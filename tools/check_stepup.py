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
Sharded runs (shard_idx/n_shards: stable crc32(key) % n_shards split, so
a key's shard never moves across reruns or registry changes) write
stepup_results.shard<i>of<n>.json — merge the shards with:

    python3 -c "import json,glob; m={}; [m.update(json.load(open(f)))
        for f in sorted(glob.glob('OUTDIR/stepup_results.shard*of*.json'))];
        json.dump(m, open('OUTDIR/stepup_results.json','w'), indent=1)"
"""
import json
import os
import subprocess
import sys
import time
import zlib

if len(sys.argv) == 6:
    sys.exit("check_stepup: shard_idx and n_shards must be given together "
             "(got 5 args — a lone shard_idx would silently run ALL keys "
             "and overwrite the unsharded results file)")
sfdir, outdir = sys.argv[1], sys.argv[2]
timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 900
only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 and sys.argv[4] else None
shard_idx, n_shards = (int(sys.argv[5]), int(sys.argv[6])) \
    if len(sys.argv) > 6 else (0, 1)
if not (0 <= shard_idx < n_shards):
    sys.exit(f"check_stepup: need 0 <= shard_idx < n_shards, "
             f"got {shard_idx}/{n_shards}")

declared = json.load(open(f"{outdir}/queries.json"))
keys = sorted(k for k in declared if only is None or k in only)
# stable hash shard: a key keeps its shard across reruns, only-filters,
# and registry growth (an index-based split reassigned keys and left
# stale entries behind)
keys = [k for k in keys
        if zlib.crc32(k.encode()) % n_shards == shard_idx]

respath = f"{outdir}/stepup_results.json" if n_shards == 1 else \
    f"{outdir}/stepup_results.shard{shard_idx}of{n_shards}.json"
res = {}
if os.path.exists(respath):
    try:
        res = json.load(open(respath))
    except json.JSONDecodeError:
        print(f"warn: {respath} corrupt (truncated mid-dump?) — starting "
              "fresh", flush=True)
        res = {}
# prune entries that are not in this run's key set (stale results from a
# prior filter or the old index-based sharding must not survive a merge)
res = {k: v for k, v in res.items() if k in set(keys)}


def dump_atomic(obj, path):
    tmp = path + ".tmp"
    json.dump(obj, open(tmp, "w"), indent=1)
    os.replace(tmp, path)


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
    dump_atomic(res, respath)

done = [k for k in keys if k in res]
npass = sum(1 for k in done if res[k]["status"] == "pass")
touts = [k for k in done if res[k]["status"] == "timeout"]
fails = [k for k in done if res[k]["status"] == "fail"]
print(f"\nSUMMARY {npass}/{len(done)} pass; timeouts={touts}; fails={fails}")
sys.exit(1 if (touts or fails) else 0)
