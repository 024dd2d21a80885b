"""Protocol runner for the committed bench record (VERDICT r3 item 2).

This host's effective CPU fluctuates ~4-6x on a timescale of minutes
(co-tenant steal), so a single bench.py pass is not a defensible
record: round 3's committed snapshot was one pass on a collapsed host
and contradicted the calm-host numbers by ~5-6x uniformly. This
wrapper applies the same discipline the scaling studies already use:

- run the FULL bench.py suite K times back-to-back (default 3),
- record per-run /proc/stat steal%% (the pollution tell),
- merge per-metric MINIMA (wall seconds; QPS is recomputed from the
  min of the corresponding seconds), and
- write the merged record to benchmarks/bench_latest.json with a
  ``protocol`` section holding every per-run (suite_sec, steal_pct)
  so a reader can judge the samples.

Usage: python scripts/bench_protocol.py [K]
Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS forwarded to bench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LATEST = os.path.join(REPO, "benchmarks", "bench_latest.json")


def _cpu_times() -> tuple[int, int]:
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return sum(v), v[7]  # total, steal


def run_once(i: int) -> tuple[dict, float]:
    tot0, st0 = _cpu_times()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_BENCH_CLOBBER": "1"})
    tot1, st1 = _cpu_times()
    steal = 100.0 * (st1 - st0) / max(tot1 - tot0, 1)
    if out.returncode != 0:
        raise RuntimeError(f"bench run {i} failed:\n{out.stderr[-2000:]}")
    with open(LATEST) as f:
        return json.load(f), steal


def merge(runs: list[dict]) -> dict:
    merged = dict(runs[-1])  # static fields from the last run
    merged["value"] = min(r["value"] for r in runs)
    q: dict[str, float] = {}
    for name in runs[-1]["queries"]:
        vals = [r["queries"][name] for r in runs
                if r["queries"].get(name, -1) >= 0]
        q[name] = min(vals) if vals else -1.0
    merged["queries"] = q
    for k in ("bm25_wand_p50_sec", "bm25_wand_mean_sec",
              "tpr_train_sec"):
        merged[k] = min(r[k] for r in runs)
    merged["tpr_serve_sec"] = q.get("topical_pagerank")
    merged["index_build_docs_per_sec"] = round(
        max(r["index_build_docs_per_sec"] for r in runs), 1)
    serving = {}
    for sec_k, qps_k, n in (("batch200_sec", "batch200_qps", 200),
                            ("sequential50_sec", "sequential_qps", 50),
                            ("native200_sec", "native_qps", 200)):
        best = min(r["serving"][sec_k] for r in runs)
        serving[sec_k] = best
        serving[qps_k] = round(n / best, 1)
    merged["serving"] = serving
    tput = {}
    for name in runs[-1].get("model_throughput", {}):
        tput[name] = max(
            (r["model_throughput"][name] for r in runs
             if name in r.get("model_throughput", {})),
            key=lambda d: d["docs_per_sec"])
    merged["model_throughput"] = tput
    return merged


def main() -> None:
    argv = sys.argv[1:]
    accumulate = "--accumulate" in argv
    argv = [a for a in argv if not a.startswith("--")]
    k = int(argv[0]) if argv else 3
    runs, steals = [], []
    prior = None
    if accumulate and os.path.exists(LATEST):
        with open(LATEST) as f:
            prior = json.load(f)
    for i in range(k):
        rec, steal = run_once(i)
        runs.append(rec)
        steals.append(steal)
        print(f"run {i}: suite {rec['value']}s  steal {steal:.1f}%",
              flush=True)
    new_entries = [{"suite_sec": r["value"], "steal_pct": round(s, 1)}
                   for r, s in zip(runs, steals)]
    # --accumulate: fold the existing merged record in as one more
    # sample (same sf/cpus only), so a later calm-host window can
    # tighten minima without discarding earlier evidence
    if prior is not None and prior.get("sf") == runs[-1].get("sf") \
            and prior.get("cpus") == runs[-1].get("cpus"):
        runs = [prior] + runs
        new_entries = prior.get("protocol", {}).get("runs", []) \
            + new_entries
    merged = merge(runs)
    merged["protocol"] = {
        "policy": ("per-metric minima over back-to-back full-suite "
                   "runs (accumulated across protocol invocations); "
                   "QPS recomputed from min seconds; per-run steal% "
                   "recorded (pollution tell)"),
        "runs": new_entries,
    }
    with open(LATEST, "w") as f:
        f.write(json.dumps(merged) + "\n")
    print("merged suite", merged["value"], "s ->", LATEST)


if __name__ == "__main__":
    main()
