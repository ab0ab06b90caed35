#!/usr/bin/env python3
"""Regenerate bench_scaling.json: run graft.Bench at sf0.001/0.01/0.1
and collect per-SF totals from bench_summary.json. Build rows
(`build_*`) are kept in the per-SF query maps but excluded from
total_sec/worst so the scale curve stays comparable across rounds
(query-serve cost vs data size; construction is its own row)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ["sf0.001", "sf0.01", "sf0.1"]


def run_sf(sf):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=f"/root/testdata/{sf}")
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"], cwd=REPO,
                   env=env, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL, check=True)
    d = json.loads(open(os.path.join(REPO, "bench_summary.json")).read().strip())
    q = d["queries"]
    serves = {k: v for k, v in q.items()
              if not k.startswith("build_") and v >= 0}
    worst = max(serves.items(), key=lambda kv: kv[1])
    return {
        "n_ok": len(serves),
        "n_skipped": sum(1 for v in q.values() if v == -2.0),
        "total_sec": round(sum(serves.values()), 1),
        "worst": [worst[0], round(worst[1], 2)],
        "builds": {k: v for k, v in q.items() if k.startswith("build_")},
        "queries": q,
    }


def main():
    sfs = sys.argv[1:] or SFS
    path = os.path.join(REPO, "bench_scaling.json")
    # merge, don't clobber: the sf1 stress point (tools/bench_stress.py)
    # lives in the same artifact
    out = json.load(open(path)) if os.path.exists(path) else {}
    for sf in sfs:
        print(f"[scaling] running {sf} ...", flush=True)
        out[sf] = run_sf(sf)
        print(f"[scaling] {sf}: {out[sf]['total_sec']} s "
              f"(worst {out[sf]['worst']})", flush=True)
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
