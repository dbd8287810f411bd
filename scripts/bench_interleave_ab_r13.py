"""Same-day A/B for the r13 bench interleaving (VERDICT r12 #3).

Question: does running the timed repetitions ROUND-ROBIN (pass 1 of all
queries, then pass 2, …) reduce per-query outliers under ambient load,
versus the old back-to-back-per-query ordering? The r10–r12 driver
sessions each produced 2–4× single-query outliers because a multi-second
excursion lands entirely inside whichever query is executing when the
repetitions are consecutive.

Design — three sessions, one machine, one hour:

1. ``calm``: the NEW bench on the idle machine → per-query reference.
2. ``old_loaded``: the OLD ordering under a deterministic periodic CPU
   burst (BURST_ON s of n-process spin every BURST_PERIOD s, started
   with the session) — the synthetic stand-in for the driver machine's
   writeback excursions, identical for both variants and phase-agnostic
   by periodicity.
3. ``new_loaded``: the NEW ordering under the same burst schedule.

Metric: per-query median and min ratios vs the calm reference. The
prediction (and the reason for the change): with back-to-back reps a
query whose whole window lands inside a burst inflates BOTH median and
min (nothing a later reader can adjudicate); interleaved, each query's
reps are minutes apart so the min stays near calm and the inflation
spreads thinly across the set. Success = the worst-query min ratio and
the count of >2x median outliers both drop under interleaving.

Usage: python scripts/bench_interleave_ab_r13.py [out_json]
(writes scripts/bench_interleave_ab_r13.json by default; the OLD
ordering is taken from git commit d7e36eb's bench.py)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OLD_BENCH_COMMIT = "d7e36eb"  # last back-to-back-ordering bench.py

#: headline subset: a spread of fast/slow, scan/join/window/dedup/ANN
#: shapes — big enough that one interleaved pass takes ~30s (so reps
#: are genuinely minutes apart), small enough for 3 sessions in ~1 h
SUBSET = ",".join([
    "q1_pricing_summary", "agg_cube", "join_inner_broadcast", "join_asof",
    "window_running_sum", "events_sessionize_30m", "dedup_lsh_jaccard_pairs",
    "sim_cosine_topk", "text_top_terms", "nested_explode_roundtrip",
    "agg_cms_heavy_hitters", "text_lm_quality_score", "snowflake_roundtrip",
    "meta_columns_jx", "sim_pq_rotated_topk",
])

BURST_ON, BURST_PERIOD, BURST_PROCS = 10.0, 30.0, 24


class _Burster:
    """Periodic CPU load: BURST_PROCS spin processes for BURST_ON s,
    every BURST_PERIOD s, until stopped."""

    def __init__(self):
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, daemon=True)

    def _loop(self):
        while not self._stop.is_set():
            procs = [subprocess.Popen(
                [sys.executable, "-c",
                 f"import time\ne=time.time()+{BURST_ON}\n"
                 "while time.time()<e: pass"])
                for _ in range(BURST_PROCS)]
            for p in procs:
                p.wait()
            self._stop.wait(BURST_PERIOD - BURST_ON)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join(timeout=BURST_PERIOD)


def run_bench(bench_path: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_BENCH_RUNS="5",
               SPARK_GRAFT_BENCH_ONLY=SUBSET,
               # the old bench copy lives outside the repo, and bench.py
               # derives its import root from __file__
               PYTHONPATH=REPO)
    t0 = time.time()
    r = subprocess.run([sys.executable, bench_path], env=env, cwd=REPO,
                       capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"bench failed: {r.stderr[-2000:]}")
    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as f:
        out = json.load(f)
    out["session_wall_sec"] = round(time.time() - t0, 1)
    return out


def ratios(loaded: dict, calm: dict, key: str) -> dict[str, float]:
    return {q: round(loaded[key][q] / max(calm[key][q], 1e-9), 2)
            for q in loaded[key]}


def _combine(sessions: dict[str, dict]):
    """Per-variant combination over its two sessions: per-query MIN of
    mins (can an outlier survive both sessions?) and MIN of medians
    (the best adjudicatable reading a reader would take); calm floor =
    per-query min across both bracketing calm sessions."""

    def merged(a: dict, b: dict) -> dict:
        out = dict(a)
        out["queries"] = {q: min(a["queries"][q], b["queries"][q])
                          for q in a["queries"]}
        out["queries_min"] = {q: min(a["queries_min"][q],
                                     b["queries_min"][q])
                              for q in a["queries_min"]}
        out["drift_pair"] = [a["drift"], b["drift"]]
        return out

    return (merged(sessions["calm1"], sessions["calm2"]),
            merged(sessions["old1"], sessions["old2"]),
            merged(sessions["new1"], sessions["new2"]))


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "scripts", "bench_interleave_ab_r13.json")
    # the old copy must live INSIDE the repo: bench.py derives both its
    # import root and its BENCH_LOCAL.json output dir from __file__ (a
    # /tmp copy silently left the previous session's artifact in place
    # — the first A/B run recorded calm twice because of exactly this)
    old_path = os.path.join(REPO, "bench_old_r13_ab.py")
    src = subprocess.run(["git", "show", f"{OLD_BENCH_COMMIT}:bench.py"],
                         cwd=REPO, capture_output=True, text=True,
                         check=True).stdout
    with open(old_path, "w") as f:
        f.write(src)

    # Session schedule (the first two attempts taught both lessons the
    # hard way): a cache warm-up first — cold parquet IO inflated one
    # "calm" reference 3x; loaded sessions in ABBA order — the machine
    # settles monotonically after heavy prior work, so a fixed
    # old-then-new order biases toward whichever runs later; calm
    # bracketed FIRST AND LAST with the per-query floor taken across
    # both, so a residual trend shows up as calm1/calm2 disagreement
    # instead of silently skewing the ratios.
    new_bench = os.path.join(REPO, "bench.py")
    sessions: dict[str, dict] = {}
    plan = [("warmup", new_bench, False), ("calm1", new_bench, False),
            ("old1", old_path, True), ("new1", new_bench, True),
            ("new2", new_bench, True), ("old2", old_path, True),
            ("calm2", new_bench, False)]
    try:
        for i, (tag, path, loaded) in enumerate(plan):
            print(f"session {i}/{len(plan) - 1}: {tag}"
                  f"{' (burst)' if loaded else ''}", flush=True)
            if loaded:
                with _Burster():
                    sessions[tag] = run_bench(path)
            else:
                sessions[tag] = run_bench(path)
    finally:
        os.unlink(old_path)
    calm, old_loaded, new_loaded = _combine(sessions)

    summary = {}
    for tag, loaded in (("old", old_loaded), ("new", new_loaded)):
        med = ratios(loaded, calm, "queries")
        mn = ratios(loaded, calm, "queries_min")
        # the adjudication signal: for queries whose MEDIAN inflated,
        # how much of the calm floor does the MIN recover? Back-to-back
        # reps inflate both together (median/min ≈ 1 — unreadable, the
        # r10–r12 outlier class); interleaved reps sit minutes apart,
        # so the min stays near calm and the ratio rises
        spread = {q: round(med[q] / max(mn[q], 1e-9), 2) for q in med
                  if med[q] > 1.5}
        summary[tag] = {
            "worst_median_ratio": max(med.values()),
            "n_median_over_2x": sum(1 for v in med.values() if v > 2),
            "worst_min_ratio": max(mn.values()),
            "n_min_over_1_5x": sum(1 for v in mn.values() if v > 1.5),
            "med_over_min_spread_inflated_qs": spread,
            "median_ratios": med,
            "min_ratios": mn,
        }
    out = {
        "burst": {"on_sec": BURST_ON, "period_sec": BURST_PERIOD,
                  "procs": BURST_PROCS},
        "subset_n": len(SUBSET.split(",")),
        "schedule": "warmup, calm1, old1, new1, new2, old2, calm2 "
                    "(ABBA + bracketing calm floor)",
        "sessions": {k: {kk: v[kk] for kk in
                         ("value", "total_min", "drift",
                          "session_wall_sec")}
                     for k, v in sessions.items()},
        "calm": calm, "old_loaded": old_loaded, "new_loaded": new_loaded,
        "summary": summary,
    }
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"old": {k: v for k, v in summary["old"].items()
                              if not k.endswith("ratios")},
                      "new": {k: v for k, v in summary["new"].items()
                              if not k.endswith("ratios")},
                      "out": dest}), flush=True)


if __name__ == "__main__":
    main()
