#!/usr/bin/env python3
"""Regenerate SURVEY.md's record blocks MECHANICALLY from the tracked
artifacts at HEAD — the r5 verdict's fix for four rounds of
headline-vs-artifact drift: the §6 headline numbers and the §7 FINAL
record are rewritten between explicit markers, so the prose can never
disagree with CORRECTNESS_r*.json / bench_summary.json /
bench_scaling.json again.

Usage:  python3 tools/survey_record.py [--round N] [--specs "211/211"]

Markers (added once, then owned by this script):
    <!-- GEN:bench-headline:BEGIN --> ... <!-- GEN:bench-headline:END -->
    <!-- GEN:final-record:BEGIN -->   ... <!-- GEN:final-record:END -->
"""
import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_correctness():
    # numeric round sort — lexicographic would rank _r9 above _r10 (r6
    # ADVICE item), so parse the round number out of each filename
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
                   key=lambda f: int(re.search(r"_r(\d+)", f).group(1)))
    if not files:
        return None, None
    n = int(re.search(r"_r(\d+)", files[-1]).group(1))
    return json.load(open(files[-1])), n


def staleness_warning(corr_round, this_round):
    """r6 verdict #6: the GEN block can silently lag the driver's final
    gate — the artifact for the CURRENT round is written after the round
    ends, so regenerating mid-round always reads the previous round.
    Print that loudly so the record block is read with that offset."""
    expect = os.path.join(REPO, f"CORRECTNESS_r{this_round:02d}.json")
    if corr_round is None:
        print("WARNING: no CORRECTNESS artifact at all — record is bench-only",
              file=sys.stderr)
    elif not os.path.exists(expect) and corr_round != this_round:
        print(f"WARNING: CORRECTNESS for round {this_round} not written yet — "
              f"correctness tallies below are from round {corr_round} "
              f"(the driver gates AFTER the snapshot; expect ±a few queries)",
              file=sys.stderr)


def head_sha():
    try:
        import subprocess
        return subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                              capture_output=True, text=True).stdout.strip()
    except Exception:
        return ""


def bench_summary():
    """Load bench_summary.json and HARD-FAIL (r7 verdict #1c) when the
    artifact is a subset/stress clobber: the r5 anti-drift chain is
    only as good as the artifact it reads, and rounds 6 AND 7 both
    committed a partial run over the canonical path. Bench now stamps
    provenance (git_sha, registry_count, subset) precisely so this
    check can be mechanical."""
    path = os.path.join(REPO, "bench_summary.json")
    if not os.path.exists(path):
        return None
    d = json.loads(open(path).read().strip())
    reg = d.get("registry_count")
    if d.get("subset") is True:
        sys.exit("FATAL: bench_summary.json was written by a SUBSET run "
                 "(subset=true) — rerun the full bench (unset "
                 "SPARK_GRAFT_QUERIES) before regenerating the record")
    if reg is not None and d.get("n_queries", 0) < reg:
        sys.exit(f"FATAL: bench_summary.json has {d.get('n_queries')} rows "
                 f"but the SparkEntry registry had {reg} queries when it was "
                 f"written — partial artifact; rerun the full bench")
    n_rows = len(d.get("queries", {}))
    if reg is not None and n_rows < reg:
        sys.exit(f"FATAL: bench_summary.json carries {n_rows} query rows "
                 f"< registry count {reg} — partial artifact")
    sha = head_sha()
    if sha and d.get("git_sha") not in (None, "unknown") \
            and d["git_sha"] != sha:
        # r8 verdict #3: count equality proved the artifact SHAPE, not
        # artifact-at-HEAD — require the diff since the stamped sha to
        # be test/doc-only, else the numbers describe other code
        changed = diff_files(d["git_sha"], sha)
        if changed is None:
            print(f"WARNING: bench_summary.json was produced at "
                  f"{d['git_sha'][:10]}, HEAD is {sha[:10]}, and the diff "
                  f"between them could not be computed — verify by hand",
                  file=sys.stderr)
        else:
            load_bearing = [f for f in changed
                            if f.startswith("src/main/") or f.startswith("tools/")]
            if load_bearing:
                sys.exit(f"FATAL: bench_summary.json was produced at "
                         f"{d['git_sha'][:10]} but HEAD {sha[:10]} changed "
                         f"src/main|tools since: {load_bearing[:8]} — rerun "
                         f"the full bench at HEAD before regenerating")
            print(f"NOTE: bench_summary.json stamped {d['git_sha'][:10]} != "
                  f"HEAD {sha[:10]}, but the diff since is test/doc-only "
                  f"({len(changed)} files) — representative", file=sys.stderr)
    return d


def diff_files(sha_a, sha_b):
    """Changed paths between two commits, or None if git can't say
    (unknown sha, shallow clone)."""
    try:
        import subprocess
        r = subprocess.run(["git", "diff", "--name-only", f"{sha_a}..{sha_b}"],
                           cwd=REPO, capture_output=True, text=True)
        if r.returncode != 0:
            return None
        return [l for l in r.stdout.splitlines() if l.strip()]
    except Exception:
        return None


def scaling():
    path = os.path.join(REPO, "bench_scaling.json")
    if not os.path.exists(path):
        return None
    return json.load(open(path))


def serves(queries):
    """The bench total convention: serve rows = everything that is not
    a build_* row and did not fail/skip (calib rows count as serves)."""
    return {k: v for k, v in queries.items()
            if not k.startswith("build_") and v >= 0}


def calib_mean(queries):
    cs, ce = queries.get("calib_start"), queries.get("calib_end")
    if cs is None or ce is None or cs <= 0 or ce <= 0:
        return None
    # the pair MEAN (r12 verdict what's-wrong #3): calib_end runs
    # 40-80% above calib_start within every run — the spread is the
    # run's own contention signature, so neither end alone is the
    # box-speed estimate; the mean is
    return (cs + ce) / 2.0


def update_history_and_delta(rnd, bench):
    """Upsert this round's canonical bench into bench_history.json and
    return a calib-normalized Δ-vs-previous-round line (r12 verdict
    what's-wrong #3 / next-round #5): raw per-row deltas conflate plan
    changes with box drift; dividing by the calibration-pair mean
    ratio separates them with one number."""
    path = os.path.join(REPO, "bench_history.json")
    hist = json.load(open(path)) if os.path.exists(path) else {}
    hist[f"r{rnd}"] = {
        "git_sha": bench.get("git_sha"),
        "n_queries": bench.get("n_queries"),
        "queries": bench.get("queries", {}),
    }
    json.dump(hist, open(path, "w"), indent=1)
    prev = hist.get(f"r{rnd - 1}")
    if not prev:
        return f"no r{rnd - 1} entry in bench_history.json — Δ starts next round"
    cur_q, prev_q = serves(bench.get("queries", {})), serves(prev["queries"])
    common = sorted(set(cur_q) & set(prev_q))
    if not common:
        return "no common serve rows with the previous round"
    cur_t = sum(cur_q[k] for k in common)
    prev_t = sum(prev_q[k] for k in common)
    cm_cur = calib_mean(cur_q)
    cm_prev = calib_mean(prev_q)
    raw = (f"Δ vs r{rnd - 1} on {len(common)} common serve rows: "
           f"{prev_t:.1f} → {cur_t:.1f} s "
           f"({100.0 * (cur_t - prev_t) / prev_t:+.1f}%)")
    if not cm_cur or not cm_prev:
        return raw + "; no calibration pair on one side — raw only"
    ratio = cm_cur / cm_prev
    norm_t = cur_t / ratio
    return (f"{raw}; calib pair mean {cm_prev:.3f} → {cm_cur:.3f} s "
            f"(box ratio {ratio:.2f}×), calib-normalized "
            f"{norm_t:.1f} s ({100.0 * (norm_t - prev_t) / prev_t:+.1f}%)")


# §4's scale-decade wall numbers, mechanized (r8 verdict #2 — the
# hand-quoted-prose drift class appeared twice): every family §4
# discusses by name, plus whatever currently tops the ratio list, is
# rendered from bench_scaling.json between GEN markers; the prose
# refers to this table instead of quoting numbers that go stale.
DECADE_TRACKED = [
    "dedup_containment", "dedup_incremental", "dedup_simhash",
    "dedup_embedding", "dedup_minhash_lsh", "build_suffix_lcp",
    "build_nsw_graph",
    "q1_pricing_summary", "q3_shipping_priority", "q18_large_orders",
    "q_copurchase_pairs", "q_triangle_count", "q_bfs_distance",
    "q_sssp", "q_pagerank", "q_link_prediction", "q_skewed_agg",
    "stream_enrich_rollup",
    "stream_hnsw_ingest", "stream_neardup_alerts", "stream_topk_events",
    "stream_ivf_ingest", "ann_ivfbq_topk",
]


def decade_table(scal):
    if not scal or "sf1" not in scal or "sf0.1" not in scal:
        return ("_no sf1 stress entry in bench_scaling.json yet — run "
                "tools/bench_stress.py_")
    base = scal["sf0.1"].get("queries", {})
    s1 = scal["sf1"].get("queries", {})
    rows = []
    for name in sorted(s1):
        b, v = base.get(name), s1[name]
        if b and b > 0 and v > 0:
            rows.append((v / b, name, b, v))
    top = sorted(rows, reverse=True)[:5]
    names = set(DECADE_TRACKED) | {n for _, n, _, _ in top}
    picked = sorted((r for r in rows if r[1] in names),
                    key=lambda r: -r[0])
    missing = [n for n in DECADE_TRACKED if n not in {r[1] for r in rows}]
    out = ["| query | sf0.1 s | sf1 (10×) s | decade ratio |",
           "| --- | --- | --- | --- |"]
    for ratio, name, b, v in picked:
        out.append(f"| `{name}` | {b:.2f} | {v:.2f} | {ratio:.1f}× |")
    out.append("")
    out.append(f"(regenerated by tools/survey_record.py from "
               f"bench_scaling.json sf0.1/sf1 at HEAD; tracked families "
               f"plus the current top-5 ratios; sub-noise rows and "
               f"families without a decade row yet: "
               f"{', '.join(missing) or 'none'})")
    return "\n".join(out)


def replace_block(text, name, body):
    begin, end = f"<!-- GEN:{name}:BEGIN -->", f"<!-- GEN:{name}:END -->"
    if begin not in text or end not in text:
        sys.exit(f"marker {name} missing from SURVEY.md — add {begin}/{end}")
    pre, rest = text.split(begin, 1)
    _, post = rest.split(end, 1)
    return pre + begin + "\n" + body.strip() + "\n" + end + post


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--specs", default=None,
                    help='e.g. "211/211" from the last sbt test run')
    args = ap.parse_args()

    corr, corr_round = latest_correctness()
    rnd = args.round or (corr_round + 1 if corr_round else 0)
    staleness_warning(corr_round, rnd)
    bench = bench_summary()
    scal = scaling()

    # ---- correctness tallies (from the latest driver gate) ----
    if corr:
        names = sorted(corr)
        n_q = len(names)
        hashed = [n for n in names if corr[n].get("hash_match")]
        # rows-only by design: no SQL oracle exists (err == "no_oracle"
        # with a non-empty spark result) — sketch internals
        rows_only = [n for n in names
                     if corr[n].get("err") == "no_oracle"
                     and (corr[n].get("spark_rows") or 0) > 0]
        failed = [n for n in names
                  if n not in hashed and n not in rows_only]
        zero_rows = [n for n in names if corr[n].get("spark_rows") == 0]
        corr_line = (
            f"{n_q} driver queries (r{corr_round} gate — the current round's "
            f"gate runs after this snapshot), {len(hashed)} hash-verified vs "
            f"DuckDB at sf0.01 ({100.0 * len(hashed) / n_q:.1f}%), "
            f"{len(rows_only)} rows-only ({', '.join(rows_only) or 'none'}), "
            f"{len(failed)} failed, {len(zero_rows)} zero-row results")
    else:
        corr_line = "no CORRECTNESS artifact found"

    # ---- bench tallies (builds split from query serves) ----
    if bench:
        q = bench.get("queries", {})
        builds = {k: v for k, v in q.items() if k.startswith("build_")}
        serves = {k: v for k, v in q.items() if not k.startswith("build_")}
        ok = {k: v for k, v in serves.items() if v >= 0}
        n_fail = sum(1 for v in serves.values() if v == -1.0)
        n_skip = sum(1 for v in serves.values() if v == -2.0)
        worst = max(ok.items(), key=lambda kv: kv[1]) if ok else ("-", 0)
        build_total = sum(v for v in builds.values() if v >= 0)
        bench_line = (
            f"{sum(ok.values()):.1f} s total over {len(ok)} queries "
            f"({n_fail} failed, {n_skip} skipped), worst query "
            f"{worst[1]:.1f} s (`{worst[0]}`)")
        if builds:
            bl = ", ".join(f"{k} {v:.1f} s" for k, v in sorted(builds.items()))
            bench_line += (
                f"; cold index builds reported separately: {bl} "
                f"({build_total:.1f} s total — query rows are warm-serve)")
    else:
        bench_line = "no bench_summary.json found"

    if scal:
        pts = []
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            if sf in scal:
                pts.append(f"{scal[sf]['total_sec']:.1f}")
        ratio = (float(pts[-1]) / float(pts[0])) if len(pts) >= 2 else 0
        scale_line = (f"scale curve {' / '.join(pts)} s at sf0.001/0.01/0.1 "
                      f"— 100× data, {ratio:.2f}× time (bench_scaling.json)")
        if "sf1" in scal:
            s1 = scal["sf1"]
            bl = ", ".join(f"{k} {v:.0f}s" for k, v in sorted(
                s1.get("builds", {}).items()))
            scale_line += (
                f"; 4th decade (self-generated 10× stress corpus,"
                f" doc/vector/stream/relational/graph families):"
                f" {s1['total_sec']:.1f} s over"
                f" {s1['n_ok']} serves, builds {bl}")
    else:
        scale_line = "no bench_scaling.json found"

    specs_line = f"; {args.specs} ScalaTest specs green" if args.specs else ""

    delta_line = update_history_and_delta(rnd, bench) if bench else None
    headline = (
        f"r{rnd} recorded @ sf0.1, regenerated by tools/survey_record.py "
        f"from bench_summary.json at HEAD — **{bench_line}**."
        + (f" {delta_line}." if delta_line else ""))
    record = (
        f"**FINAL r{rnd} record — REGENERATED MECHANICALLY by "
        f"`tools/survey_record.py` from the tracked artifacts at HEAD "
        f"(the r5 anti-drift fix): {corr_line}{specs_line}; full bench at "
        f"sf0.1 = {bench_line}; {scale_line}.**")

    survey_path = os.path.join(REPO, "SURVEY.md")
    text = open(survey_path).read()
    text = replace_block(text, "bench-headline", headline)
    text = replace_block(text, "scale-decade", decade_table(scal))
    text = replace_block(text, "final-record", record)
    open(survey_path, "w").write(text)
    print(headline)
    print(record)


if __name__ == "__main__":
    main()
